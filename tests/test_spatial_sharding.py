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


def test_hybrid_dp_sp_train_step_matches_pure_dp():
    """Hybrid data x spatial TRAINING: the same jitted train step over a
    4x2 (data, spatial) mesh — images sharded [B@data, H@spatial] — must
    produce the same loss/num_fg/updated params as the pure-DP run. GSPMD
    owns the conv halo exchanges in forward AND backward, and the
    gradient/BN reductions span both mesh axes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_ms_tpu.parallel.mesh import (
        batch_sharding,
        hybrid_batch_sharding,
        make_mesh_2d,
    )
    from yolo_ms_tpu.train.loss import DetectionLoss
    from yolo_ms_tpu.train.optim import build_optimizer
    from yolo_ms_tpu.train.trainer import TrainState, make_train_step
    from yolo_ms_tpu.utils.config import TrainingConfig

    devices = jax.devices()
    assert len(devices) >= 8

    nc, img, batch, max_gt = 4, 64, 8, 4
    model = build_model("n", num_classes=nc)
    variables = init_model(model, jax.random.PRNGKey(0), (img, img))
    loss_fn = DetectionLoss(num_classes=nc)
    # SGD for the equivalence check: Adam's first-step update is
    # ~lr*sign(g), so float reduction-order noise on a near-zero gradient
    # flips a full +-lr — SGD's update stays proportional to the gradient,
    # making param comparison meaningful.
    tx, _ = build_optimizer(
        TrainingConfig(
            batch_size=batch, epochs=1, weight_decay=0.0, optimizer="sgd"
        ),
        10,
    )
    step_fn = make_train_step(model, loss_fn, tx)

    def fresh_state():
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )

    rng = np.random.default_rng(0)
    # distinct random boxes per image: identical boxes across the batch
    # create EXACT alignment-metric ties in the TAL top-k, whose
    # resolution legitimately flips under resharding (reduction-order
    # noise at the 1e-7 level decides the tie) — that tests tie-breaking,
    # not the parallelism
    centers = rng.uniform(0.3, 0.7, (batch, max_gt, 2)).astype(np.float32)
    sizes = rng.uniform(0.3, 0.6, (batch, max_gt, 2)).astype(np.float32)
    host = {
        "images": rng.standard_normal((batch, img, img, 3)).astype(np.float32),
        "boxes": np.concatenate([centers, sizes], axis=-1),
        "labels": rng.integers(0, nc, (batch, max_gt)).astype(np.int32),
        "mask": np.tile(
            np.asarray([True, True] + [False] * (max_gt - 2)), (batch, 1)
        ),
    }

    def run(mesh, image_sharding, n_steps=2):
        repl = NamedSharding(mesh, P())
        data_sh = batch_sharding(mesh)
        shardings = {
            "images": image_sharding,
            "boxes": data_sh,
            "labels": data_sh,
            "mask": data_sh,
        }
        step = jax.jit(
            step_fn,
            in_shardings=(repl, shardings),
            out_shardings=(repl, repl),
        )
        dev = {k: jax.device_put(v, shardings[k]) for k, v in host.items()}
        state, losses, fgs = fresh_state(), [], []
        for _ in range(n_steps):
            state, metrics = jax.block_until_ready(step(state, dev))
            m = jax.device_get(metrics)
            losses.append(float(m["total_loss"]))
            fgs.append(int(m["num_fg"]))
        return jax.device_get(state), losses, fgs

    from yolo_ms_tpu.parallel.mesh import make_mesh

    dp_mesh = make_mesh(devices[:8])
    s_dp, loss_dp, fg_dp = run(dp_mesh, batch_sharding(dp_mesh))

    mesh2d = make_mesh_2d(4, 2, devices)
    s_hy, loss_hy, fg_hy = run(mesh2d, hybrid_batch_sharding(mesh2d))

    # step 1 consumes identical params -> loss/num_fg must match tightly
    assert fg_dp[0] == fg_hy[0] > 0
    np.testing.assert_allclose(loss_dp[0], loss_hy[0], rtol=1e-5)
    # step 2 consumes the step-1 UPDATE: functional training equivalence.
    # Bitwise-grade equality is not achievable across shardings (gradient
    # reductions group differently, and once params differ at float-noise
    # level the TAL's discrete top-k can flip an anchor sitting exactly on
    # a selection boundary), but the training trajectory must agree: the
    # positive set within a couple of anchors, loss within the quantum a
    # flipped anchor accounts for.
    assert fg_hy[1] > 0 and abs(fg_dp[1] - fg_hy[1]) <= 2, (fg_dp, fg_hy)
    # one flipped anchor shifts the box/DFL normalization by ~1/num_fg
    # (~2% here) — the loss must agree within that assignment quantum
    np.testing.assert_allclose(loss_dp[1], loss_hy[1], rtol=5e-2)
    # and the two updated param trees stay within float-trajectory noise
    num = sum(
        float(np.sum((a - b) ** 2))
        for a, b in zip(
            jax.tree_util.tree_leaves(s_dp.params),
            jax.tree_util.tree_leaves(s_hy.params),
        )
    )
    den = sum(
        float(np.sum(a**2)) for a in jax.tree_util.tree_leaves(s_dp.params)
    )
    assert (num / den) ** 0.5 < 1e-2, (num, den)


def test_batch_sharded_serving_matches_single_device():
    """DP serving: the whole deploy pipeline (BN-folded forward + fused
    tail) with the BATCH sharded over the mesh must equal the
    single-device outputs exactly — per-image work has no cross-device
    dependency, so GSPMD partitions it without any collectives and
    throughput scales with chips."""
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.parallel.mesh import batch_sharding

    devices = jax.devices()
    assert len(devices) >= 4
    mesh = make_mesh(devices[:4])
    nc = 8
    model = build_model("n", num_classes=nc)
    variables = fold_batchnorm(init_model(model, jax.random.PRNGKey(0), (128, 128)))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 128, 128, 3)), jnp.float32)

    def infer(v, images):
        with deploy_mode():
            raw = model.apply(v, images, train=False, split_head=True)
        return fused_postprocess(raw, nc, conf_thresh=1e-6, pre_nms_topk=64, max_det=16)

    want = jax.device_get(jax.jit(infer)(variables, x))

    repl = replicated_sharding(mesh)
    dp = batch_sharding(mesh)
    got = jax.device_get(
        jax.jit(infer, in_shardings=(repl, dp), out_shardings=repl)(
            jax.device_put(variables, repl), jax.device_put(x, dp)
        )
    )
    np.testing.assert_array_equal(got["valid"], want["valid"])
    v = want["valid"]
    np.testing.assert_array_equal(got["classes"][v], want["classes"][v])
    np.testing.assert_allclose(got["scores"][v], want["scores"][v], rtol=1e-5)
    np.testing.assert_allclose(got["boxes"][v], want["boxes"][v], rtol=1e-4, atol=1e-3)
