"""SyncBN-under-GSPMD test: BatchNorm statistics computed on a batch sharded
over 8 devices must equal the single-device global-batch statistics — the
property that replaces the reference zoo's syncbn_fast configs
(SURVEY.md §2.4, model_zoos.md:28)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_ms_tpu.models.registry import build_model, init_model
from yolo_ms_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_batch_stats_match_global_batch():
    img, batch = 64, 16
    model = build_model("n", num_classes=2)
    variables = init_model(model, jax.random.PRNGKey(0), (img, img))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, img, img, 3))

    def step(v, x):
        _, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
        return updates["batch_stats"]

    # single-device global batch
    ref = jax.device_get(jax.jit(step)(variables, x))

    # batch sharded over the 8-device mesh, params replicated
    mesh = make_mesh()
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    sharded_step = jax.jit(step, in_shardings=(repl, data), out_shardings=repl)
    got = jax.device_get(
        sharded_step(jax.device_put(variables, repl), jax.device_put(x, data))
    )

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
