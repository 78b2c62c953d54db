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


def test_nan_guard_catches_finite_loss_nonfinite_grads():
    """All-constant images give zero-variance train-mode BN: every loss term
    stays finite but the backward overflows (~rsqrt(eps) amplification per
    layer, then inf * zero-activation = nan in conv kernel grads). The guard
    must freeze params AND optimizer moments — a loss-only check misses it
    and the nan moments would poison every later step."""
    step, state, batch = make_setup()
    bad = dict(batch)
    bad["images"] = jnp.zeros_like(batch["images"])
    new_state, metrics = step(state, bad)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for leaf in jax.tree_util.tree_leaves(new_state.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.all(jnp.isfinite(leaf)))


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


def test_gt_bucket_slicing_is_exact():
    """Slicing fully-masked GT padding off the batch must not change the
    step: the TAL assigner zeroes padded rows via mask_in and every gather
    rides mask_pos, so a [B, 16]-padded batch with 2 valid GTs produces the
    same loss/num_fg/updated params as the [B, 4]-bucketed one (the
    Trainer._bucket_gt contract)."""
    step, state, batch = make_setup()
    pad_to = 16
    b, m = batch["boxes"].shape[:2]
    wide = {
        "images": batch["images"],
        "boxes": jnp.concatenate(
            [batch["boxes"], jnp.ones((b, pad_to - m, 4)) * 0.25], axis=1
        ),
        "labels": jnp.concatenate(
            [batch["labels"], jnp.ones((b, pad_to - m), jnp.int32)], axis=1
        ),
        "mask": jnp.concatenate(
            [batch["mask"], jnp.zeros((b, pad_to - m), bool)], axis=1
        ),
    }
    s_wide, m_wide = step(state, wide)
    step2, state2, _ = make_setup()  # fresh state (donation-free reuse)
    s_slim, m_slim = step2(state2, batch)

    assert int(m_wide["num_fg"]) == int(m_slim["num_fg"])
    np.testing.assert_allclose(
        float(m_wide["total_loss"]), float(m_slim["total_loss"]), rtol=1e-5
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s_wide.params),
        jax.tree_util.tree_leaves(s_slim.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6
        )


def test_bucket_gt_picks_covering_bucket():
    """_bucket_gt covers the highest USED slot (non-prefix-safe) and falls
    back to the full padded width when no bucket covers it."""
    from types import SimpleNamespace

    from yolo_ms_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    host = {
        "images": rng.standard_normal((2, 8, 8, 3)).astype(np.float32),
        "boxes": rng.random((2, 16, 4)).astype(np.float32),
        "labels": np.zeros((2, 16), np.int32),
        "mask": np.zeros((2, 16), bool),
    }
    self = SimpleNamespace(_gt_buckets=(4, 8), _seen_buckets=set())

    # valid slot only at index 5 (non-prefix) -> needs 6 -> bucket 8
    host["mask"][1, 5] = True
    out = Trainer._bucket_gt(self, host)
    assert out["boxes"].shape[1] == 8
    assert out["mask"][1, 5]

    # slot 9 used -> needs 10 -> no bucket covers -> full width unchanged
    host["mask"][0, 9] = True
    out = Trainer._bucket_gt(self, host)
    assert out["boxes"].shape[1] == 16

    # empty batch -> smallest bucket
    host["mask"][:] = False
    out = Trainer._bucket_gt(self, host)
    assert out["boxes"].shape[1] == 4

    # bucketing disabled -> untouched
    self.buckets_off = SimpleNamespace(_gt_buckets=(), _seen_buckets=set())
    out = Trainer._bucket_gt(self.buckets_off, host)
    assert out["boxes"].shape[1] == 16
