"""Spatial (height-axis) sharded inference on the virtual mesh.

GSPMD must insert conv halo exchanges so the H-sharded forward is
numerically identical to the single-device forward, end to end through
the fused post-process (whose anchor-axis reductions become collectives).
"""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.models.registry import build_model, init_model
from yolo_ms_tpu.ops.postprocess import fused_postprocess
from yolo_ms_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    spatial_sharding,
)


def test_height_sharded_forward_matches_single_device():
    devices = jax.devices()
    assert len(devices) >= 4, "conftest provides an 8-device virtual mesh"
    mesh = make_mesh(devices[:4])
    nc = 8
    model = build_model("n", num_classes=nc)
    variables = init_model(model, jax.random.PRNGKey(0), (128, 128))

    rng = np.random.default_rng(0)
    # ONE image (B=1 < mesh size: batch sharding impossible, spatial isn't)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)

    def infer(v, images):
        raw = model.apply(v, images, train=False)
        return fused_postprocess(raw, nc, conf_thresh=1e-6, pre_nms_topk=64, max_det=16)

    want = jax.device_get(jax.jit(infer)(variables, x))

    repl = replicated_sharding(mesh)
    sp = spatial_sharding(mesh)
    x_sharded = jax.device_put(x, sp)
    v_repl = jax.device_put(variables, repl)
    got = jax.device_get(
        jax.jit(infer, in_shardings=(repl, sp), out_shardings=repl)(
            v_repl, x_sharded
        )
    )

    np.testing.assert_array_equal(got["valid"], want["valid"])
    v = want["valid"]
    np.testing.assert_array_equal(got["classes"][v], want["classes"][v])
    np.testing.assert_allclose(got["scores"][v], want["scores"][v], rtol=1e-5)
    np.testing.assert_allclose(
        got["boxes"][v], want["boxes"][v], rtol=1e-4, atol=1e-3
    )
