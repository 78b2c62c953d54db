"""Decode tests: DFL expectation + anchor decode vs hand-computed fixtures.

Golden values follow the reference eval path math (yolov8_head.py:127-144):
x1y1 = anchor - lt, x2y2 = anchor + rb, out = ((a+b)/2, b-a) * stride.
"""

import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.models.decode import (
    decode_boxes,
    decode_boxes_xyxy,
    decode_predictions,
    flatten_maps,
    make_anchors,
)


def one_hot_dist(bins, reg_max=16, sharp=50.0):
    """Build DFL logits whose expectation is ~exactly `bins` (integer)."""
    d = np.full((len(bins), reg_max), -sharp, dtype=np.float32)
    for i, b in enumerate(bins):
        d[i, b] = sharp
    return d


def test_decode_boxes_golden():
    # One anchor at grid (0.5, 0.5), stride 8. DFL picks lt=(1,2), rb=(3,4).
    anchors = jnp.asarray([[0.5, 0.5]], dtype=jnp.float32)
    strides = jnp.asarray([[8.0]], dtype=jnp.float32)
    dist = one_hot_dist([1, 2, 3, 4])[None, None]  # [B=1, A=1, 4, 16]
    out = np.asarray(decode_boxes(jnp.asarray(dist), anchors, strides))[0, 0]
    # x1y1 = (0.5-1, 0.5-2) = (-0.5, -1.5); x2y2 = (3.5, 4.5)
    # center = (1.5, 1.5), wh = (4, 6); x stride 8
    np.testing.assert_allclose(out, [12.0, 12.0, 32.0, 48.0], atol=1e-4)

    xyxy = np.asarray(decode_boxes_xyxy(jnp.asarray(dist), anchors, strides))[0, 0]
    np.testing.assert_allclose(xyxy, [-4.0, -12.0, 28.0, 36.0], atol=1e-4)


def test_flatten_maps_layout():
    """Channel split: first 4*reg_max are box dist (ltrb-major), rest cls."""
    b, nc, rm = 2, 3, 4
    no = 4 * rm + nc
    m1 = np.zeros((b, 2, 2, no), dtype=np.float32)
    m2 = np.zeros((b, 1, 1, no), dtype=np.float32)
    m1[0, 0, 0, : 4 * rm] = np.arange(16)
    m1[0, 0, 0, 4 * rm :] = [7, 8, 9]
    box, cls = flatten_maps([jnp.asarray(m1), jnp.asarray(m2)], nc, rm)
    assert box.shape == (b, 5, 4, rm)
    assert cls.shape == (b, 5, nc)
    np.testing.assert_allclose(np.asarray(box[0, 0, 0]), [0, 1, 2, 3])
    np.testing.assert_allclose(np.asarray(box[0, 0, 3]), [12, 13, 14, 15])
    np.testing.assert_allclose(np.asarray(cls[0, 0]), [7, 8, 9])


def test_anchor_order_row_major():
    anchors, _ = make_anchors([(2, 3)], strides=[8])
    a = np.asarray(anchors)
    # Row-major: (x varies fastest), offset 0.5
    np.testing.assert_allclose(
        a, [[0.5, 0.5], [1.5, 0.5], [2.5, 0.5], [0.5, 1.5], [1.5, 1.5], [2.5, 1.5]]
    )


def test_decode_predictions_end_to_end():
    """Uniform logits -> all boxes identical expectation, sigmoid cls = 0.5."""
    nc, rm = 2, 16
    raw = [jnp.zeros((1, 4, 4, 4 * rm + nc)), jnp.zeros((1, 2, 2, 4 * rm + nc)),
           jnp.zeros((1, 1, 1, 4 * rm + nc))]
    out = np.asarray(decode_predictions(raw, nc, rm, strides=(8, 16, 32)))
    assert out.shape == (1, 16 + 4 + 1, 4 + nc)
    np.testing.assert_allclose(out[0, :, 4:], 0.5)
    # uniform dist -> lt = rb = 7.5 -> w = h = 15 grid units -> *stride
    np.testing.assert_allclose(out[0, 0, 2:4], [120.0, 120.0], atol=1e-4)
    np.testing.assert_allclose(out[0, -1, 2:4], [480.0, 480.0], atol=1e-4)
    # first anchor of level 0: center 0.5 grid * 8 = 4px
    np.testing.assert_allclose(out[0, 0, 0:2], [4.0, 4.0], atol=1e-4)


class TestBf16DecodePrecision:
    def test_bf16_maps_decode_within_1px_of_f32(self):
        """decode_predictions must run its box math in f32 even when the
        model emits bf16 maps: bf16 coordinate math at 640-px scale would
        quantize boxes by ~2.5 px (8 mantissa bits). The only remaining
        difference is the bf16 rounding of the raw logits themselves."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.models.decode import decode_predictions

        nc, reg_max = 80, 16
        rng = np.random.default_rng(0)
        shapes = [(80, 80), (40, 40), (20, 20)]
        raw_f32 = [
            jnp.asarray(
                rng.standard_normal((2, h, w, 4 * reg_max + nc)) * 2.0,
                jnp.float32,
            )
            for h, w in shapes
        ]
        # Compare decode on IDENTICAL logit values, once tagged bf16 and once
        # f32 — isolating the decode arithmetic from input quantization.
        raw_bf16 = [m.astype(jnp.bfloat16) for m in raw_f32]
        raw_same = [m.astype(jnp.float32) for m in raw_bf16]

        out_f32 = np.asarray(decode_predictions(raw_same, nc))
        out_bf16 = np.asarray(decode_predictions(raw_bf16, nc))
        assert out_bf16.dtype == np.float32
        box_err = np.abs(out_bf16[..., :4] - out_f32[..., :4]).max()
        assert box_err < 1e-3, f"bf16-path decode box error {box_err:.5f}px"

        # And end-to-end (bf16 quantization of the logits included) the
        # boxes stay within 1 px of the pure-f32 pipeline.
        out_pure = np.asarray(decode_predictions(raw_f32, nc))
        e2e_err = np.abs(out_bf16[..., :4] - out_pure[..., :4]).max()
        assert e2e_err < 2.5, f"bf16 e2e box error {e2e_err:.3f}px"
