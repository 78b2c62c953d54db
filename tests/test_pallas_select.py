"""Pallas selection kernel vs the XLA reference path (interpret mode).

The kernel must reproduce, per anchor: max class logit, first-index argmax
class id, and the DFL softmax expectation (components.py:162-191 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _xla_reference(flat_m, nc, reg_max):
    from yolo_ms_tpu.nn.blocks import dfl_expectation

    b, hw, no = flat_m.shape
    cls_m = flat_m[..., 4 * reg_max :]
    mx = jnp.max(cls_m, axis=-1).astype(jnp.float32)
    cid = jnp.argmax(cls_m, axis=-1).astype(jnp.int32)
    ltrb = dfl_expectation(flat_m[..., : 4 * reg_max].reshape(b, hw, 4, reg_max))
    return mx, cid, ltrb


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_select_scale_matches_xla(dtype):
    from yolo_ms_tpu.ops.pallas.select import select_scale

    nc, reg_max = 80, 16
    b, hw = 2, 16 * 25  # 400 anchors (P5 at 640), 16-sublane aligned
    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.standard_normal((b, hw, 4 * reg_max + nc)) * 2.0, dtype
    )
    want_mx, want_cid, want_ltrb = jax.device_get(
        _xla_reference(flat, nc, reg_max)
    )
    got_mx, got_cid, got_ltrb = jax.device_get(
        select_scale(flat, nc, reg_max, interpret=True)
    )
    np.testing.assert_allclose(got_mx, want_mx, rtol=1e-6)
    np.testing.assert_array_equal(got_cid, want_cid)
    np.testing.assert_allclose(got_ltrb, want_ltrb, rtol=1e-5, atol=1e-5)


def test_select_scale_ties_and_extremes():
    """First-index argmax tie-break and the -60 exp clamp guard."""
    from yolo_ms_tpu.ops.pallas.select import select_scale

    nc, reg_max = 8, 16
    b, hw = 1, 16
    flat = np.zeros((b, hw, 4 * reg_max + nc), np.float32)
    # all-equal class logits -> argmax must be 0
    # one extreme DFL row: side 0 dominated by bin 3 at +100 (others 0)
    flat[0, 0, 3] = 100.0
    got_mx, got_cid, got_ltrb = jax.device_get(
        select_scale(jnp.asarray(flat), nc, reg_max, interpret=True)
    )
    assert int(got_cid[0, 0]) == 0
    assert abs(float(got_ltrb[0, 0, 0]) - 3.0) < 1e-4  # expectation -> bin 3
    assert np.isfinite(got_ltrb).all()


def test_fused_postprocess_use_pallas_matches_xla():
    """The use_pallas=True integration path of fused_postprocess (ltrb_all
    adaptation + dtype-parity cast) must reproduce the XLA path."""
    from yolo_ms_tpu.ops.postprocess import fused_postprocess

    nc, reg_max = 80, 16
    rng = np.random.default_rng(3)
    shapes = [(8, 8), (4, 4), (2, 8)]  # hw: 64, 16, 16 (16-aligned)
    raw = [
        jnp.asarray(
            rng.standard_normal((2, h, w, 4 * reg_max + nc)) * 1.5, jnp.float32
        )
        for h, w in shapes
    ]
    want = jax.device_get(
        fused_postprocess(raw, nc, pre_nms_topk=64, max_det=20)
    )
    got = jax.device_get(
        fused_postprocess(raw, nc, pre_nms_topk=64, max_det=20, use_pallas=True)
    )
    np.testing.assert_array_equal(got["valid"], want["valid"])
    v = want["valid"]
    np.testing.assert_array_equal(got["classes"][v], want["classes"][v])
    np.testing.assert_allclose(got["scores"][v], want["scores"][v], rtol=1e-5)
    np.testing.assert_allclose(
        got["boxes"][v], want["boxes"][v], rtol=1e-4, atol=1e-3
    )


def test_block_picker_alignment():
    from yolo_ms_tpu.ops.pallas.select import (
        _padded_bytes,
        _pick_block,
        select_supported,
    )

    no = 144
    for b in (1, 8, 128):
        for hw in (6400, 1600, 400, 3072):
            bt, t = _pick_block(b, hw, no)
            assert hw % t == 0 and b % bt == 0
            assert t % 2 == 0  # the [T/2, 128] DFL view needs even anchors
            assert _padded_bytes(bt * t, no) <= 2 * 1024 * 1024
            assert select_supported(hw)
    assert not select_supported(169)
