"""Unit tests for the train step: NaN guard, EMA, freeze via optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.models.registry import build_model, init_model
from yolo_ms_tpu.train.loss import DetectionLoss
from yolo_ms_tpu.train.optim import build_optimizer
from yolo_ms_tpu.train.trainer import TrainState, make_train_step
from yolo_ms_tpu.utils.config import TrainingConfig


def make_setup(ema_decay=0.0, img=64, batch=2, nc=2):
    model = build_model("n", num_classes=nc)
    v = init_model(model, jax.random.PRNGKey(0), (img, img))
    loss_fn = DetectionLoss(num_classes=nc)
    tx, _ = build_optimizer(
        TrainingConfig(batch_size=batch, epochs=1, weight_decay=0.0), 10
    )
    step = jax.jit(make_train_step(model, loss_fn, tx, ema_decay=ema_decay))
    state = TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
        ema_params=(
            jax.tree_util.tree_map(lambda p: p, v["params"]) if ema_decay > 0 else None
        ),
        ema_batch_stats=(
            jax.tree_util.tree_map(lambda p: p, v["batch_stats"])
            if ema_decay > 0
            else None
        ),
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "images": jnp.asarray(rng.standard_normal((batch, img, img, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.5, 0.5, 0.4, 0.4]), (batch, 4, 1)),
        "labels": jnp.zeros((batch, 4), jnp.int32),
        "mask": jnp.tile(jnp.asarray([True, False, False, False]), (batch, 1)),
    }
    return step, state, batch_data


def test_step_updates_params_and_counts():
    step, state, batch = make_setup()
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert float(metrics["skipped_nonfinite"]) == 0.0
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_nan_guard_freezes_state():
    """A batch that produces non-finite loss must leave params unchanged
    (train.py:365-368 parity, jit-safe)."""
    step, state, batch = make_setup()
    bad = dict(batch)
    bad["images"] = batch["images"].at[0, 0, 0, 0].set(jnp.nan)
    new_state, metrics = step(state, bad)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == 1  # step counter still advances


def test_ema_tracks_params():
    step, state, batch = make_setup(ema_decay=0.99)
    s1, _ = step(state, batch)
    # EMA moved toward new params but is not equal to either endpoint
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(s1.ema_params)[0])
    assert not np.allclose(e1, p0)
    # with warmup, effective decay is tiny at step 0 -> ema close to params
    assert np.abs(e1 - p1).max() < np.abs(p0 - p1).max() + 1e-6


def test_ema_tracks_batch_stats():
    """EMA must average the WHOLE model incl. BN running stats (ultralytics
    semantics): evaluating EMA params against raw batch stats is internally
    inconsistent, so the train step keeps an ema_batch_stats in lockstep."""
    step, state, batch = make_setup(ema_decay=0.99)
    s1, _ = step(state, batch)
    assert s1.ema_batch_stats is not None
    b0 = np.asarray(jax.tree_util.tree_leaves(state.batch_stats)[0])
    b1 = np.asarray(jax.tree_util.tree_leaves(s1.batch_stats)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(s1.ema_batch_stats)[0])
    assert not np.allclose(e1, b0)  # moved
    # warmup makes effective decay tiny at step 0 -> ema hugs the new stats
    assert np.abs(e1 - b1).max() < np.abs(b0 - b1).max() + 1e-6

    # NaN guard freezes the EMA stats too
    bad = dict(batch)
    bad["images"] = batch["images"].at[0, 0, 0, 0].set(jnp.nan)
    s2, m2 = step(s1, bad)
    assert float(m2["skipped_nonfinite"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.ema_batch_stats),
        jax.tree_util.tree_leaves(s2.ema_batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_disabled_stays_none():
    step, state, batch = make_setup(ema_decay=0.0)
    s1, _ = step(state, batch)
    assert s1.ema_params is None
    assert s1.ema_batch_stats is None
