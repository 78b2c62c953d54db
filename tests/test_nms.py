"""NMS tests: exact greedy semantics vs a numpy oracle, fixed shapes, jit.

The oracle reimplements torchvision.ops.nms's documented greedy algorithm in
numpy (keep highest score, drop overlaps > threshold, repeat) — the behavior
the reference relies on at tools/test.py:202 and tools/train.py:93.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_ms_tpu.ops.iou import xywh_to_xyxy
from yolo_ms_tpu.ops.nms import batched_nms, nms_fixed


def np_greedy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    """Reference greedy NMS -> kept indices (into the input order).

    Row-vectorized (IoU of each kept box against all others at once) but
    semantically identical to the per-pair greedy scan: iterate boxes in
    descending score order, keep if not yet suppressed, suppress everything
    overlapping the kept box above the threshold."""
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou > thresh
        suppressed[i] = False
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_fixed_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 64
    centers = rng.uniform(50, 200, (n, 2))
    sizes = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1).astype(
        np.float32
    )
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    order = np.argsort(-scores)
    b_sorted, s_sorted = boxes[order], scores[order]

    keep_mask = np.asarray(nms_fixed(jnp.asarray(b_sorted), jnp.asarray(s_sorted), 0.5))
    got = set(np.nonzero(keep_mask)[0].tolist())

    expect = set(np_greedy_nms(b_sorted, s_sorted, 0.5))
    assert got == expect


def test_nms_fixed_equals_scan_on_suppression_chains():
    """Adversarial chains (each box overlaps the next) exercise the iterative
    refinement's worst case; must equal the sequential greedy scan."""
    from yolo_ms_tpu.ops.nms import nms_greedy_scan

    rng = np.random.default_rng(42)
    for _ in range(3):
        n = 128
        cx = np.arange(n) * 8.0 + rng.uniform(-2, 2, n)
        boxes = np.stack(
            [cx, np.zeros(n), cx + 16, np.full(n, 16.0)], -1
        ).astype(np.float32)
        scores = np.sort(rng.uniform(0.1, 1, n))[::-1].astype(np.float32).copy()
        a = np.asarray(nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
        b = np.asarray(nms_greedy_scan(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
        np.testing.assert_array_equal(a, b)


def test_nms_invalid_rows_never_kept():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, -1.0])
    keep = np.asarray(nms_fixed(boxes, scores, 0.5))
    assert keep.tolist() == [True, False]


class TestBatchedNMS:
    def _preds(self, dets, nc, a=100):
        """Build a decoded [1, A, 4+nc] tensor from (cx,cy,w,h,score,cls)."""
        p = np.zeros((1, a, 4 + nc), dtype=np.float32)
        for i, (cx, cy, w, h, s, c) in enumerate(dets):
            p[0, i, :4] = [cx, cy, w, h]
            p[0, i, 4 + c] = s
        return jnp.asarray(p)

    def test_class_aware_keeps_overlapping_different_classes(self):
        """Same box, two classes -> both survive (per-class NMS semantics)."""
        preds = self._preds(
            [(50, 50, 20, 20, 0.9, 0), (50, 50, 20, 20, 0.8, 1)], nc=3
        )
        out = batched_nms(preds, conf_thresh=0.25, iou_thresh=0.45, pre_nms_topk=16, max_det=8)
        valid = np.asarray(out["valid"][0])
        assert valid.sum() == 2
        cls = np.asarray(out["classes"][0])[valid]
        assert set(cls.tolist()) == {0, 1}

    def test_same_class_overlap_suppressed(self):
        preds = self._preds(
            [(50, 50, 20, 20, 0.9, 1), (52, 51, 20, 20, 0.8, 1), (200, 200, 10, 10, 0.7, 1)],
            nc=3,
        )
        out = batched_nms(preds, conf_thresh=0.25, iou_thresh=0.45, pre_nms_topk=16, max_det=8)
        valid = np.asarray(out["valid"][0])
        assert valid.sum() == 2
        scores = np.asarray(out["scores"][0])[valid]
        np.testing.assert_allclose(sorted(scores.tolist()), [0.7, 0.9], atol=1e-6)

    def test_conf_threshold(self):
        preds = self._preds([(50, 50, 20, 20, 0.2, 0)], nc=2)
        out = batched_nms(preds, conf_thresh=0.25, pre_nms_topk=16, max_det=8)
        assert np.asarray(out["valid"]).sum() == 0

    def test_output_shapes_fixed(self):
        preds = jnp.zeros((3, 500, 4 + 80))
        out = batched_nms(preds, max_det=300, pre_nms_topk=256)
        assert out["boxes"].shape == (3, 300, 4)
        assert out["scores"].shape == (3, 300)
        assert out["classes"].shape == (3, 300)
        assert out["valid"].shape == (3, 300)

    def test_boxes_are_xyxy(self):
        preds = self._preds([(50, 60, 20, 10, 0.9, 0)], nc=1)
        out = batched_nms(preds, pre_nms_topk=16, max_det=4)
        box = np.asarray(out["boxes"][0, 0])
        np.testing.assert_allclose(box, [40, 55, 60, 65], atol=1e-5)

    def test_matches_reference_pipeline_oracle(self):
        """Random decoded preds -> our pipeline == conf-filter + per-class
        greedy NMS oracle (tools/test.py:167-218 semantics)."""
        rng = np.random.default_rng(7)
        a, nc = 200, 5
        p = np.zeros((1, a, 4 + nc), dtype=np.float32)
        p[0, :, 0:2] = rng.uniform(100, 500, (a, 2))
        p[0, :, 2:4] = rng.uniform(10, 120, (a, 2))
        p[0, :, 4:] = rng.uniform(0, 1, (a, nc)) ** 3  # sparse high scores

        out = batched_nms(
            jnp.asarray(p), conf_thresh=0.25, iou_thresh=0.45, pre_nms_topk=256, max_det=256
        )
        valid = np.asarray(out["valid"][0])
        got = {
            (round(float(s), 5), int(c))
            for s, c in zip(
                np.asarray(out["scores"][0])[valid], np.asarray(out["classes"][0])[valid]
            )
        }

        # Oracle
        boxes_xyxy = np.asarray(xywh_to_xyxy(jnp.asarray(p[0, :, :4])))
        scores = p[0, :, 4:].max(-1)
        classes = p[0, :, 4:].argmax(-1)
        mask = scores > 0.25
        expect = set()
        for c in np.unique(classes[mask]):
            sel = mask & (classes == c)
            idx = np.nonzero(sel)[0]
            keep_local = np_greedy_nms(boxes_xyxy[idx], scores[idx], 0.45)
            for k in keep_local:
                expect.add((round(float(scores[idx[k]]), 5), int(c)))
        assert got == expect


class TestFusedPostprocess:
    def test_matches_unfused_pipeline(self):
        """fused_postprocess(raw) must reproduce
        batched_nms(decode_predictions(raw)) — same boxes/scores/classes."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.models.decode import decode_predictions
        from yolo_ms_tpu.ops.nms import batched_nms
        from yolo_ms_tpu.ops.postprocess import fused_postprocess

        nc, reg_max = 7, 16
        rng = np.random.default_rng(0)
        shapes = [(16, 16), (8, 8), (4, 4)]
        raw = [
            jnp.asarray(
                rng.standard_normal((3, h, w, 4 * reg_max + nc)) * 1.5,
                jnp.float32,
            )
            for h, w in shapes
        ]
        want = jax.device_get(
            batched_nms(
                decode_predictions(raw, nc), pre_nms_topk=256, max_det=50
            )
        )
        got = jax.device_get(
            fused_postprocess(raw, nc, pre_nms_topk=256, max_det=50)
        )
        np.testing.assert_array_equal(got["valid"], want["valid"])
        v = want["valid"]
        np.testing.assert_array_equal(got["classes"][v], want["classes"][v])
        np.testing.assert_allclose(got["scores"][v], want["scores"][v], rtol=1e-5)
        np.testing.assert_allclose(
            got["boxes"][v], want["boxes"][v], rtol=1e-4, atol=1e-3
        )

    def test_adaptive_prefix_nms_both_branches(self):
        """fused_postprocess runs NMS on a 256-prefix when every image's
        conf survivors fit (lax.cond); both branches must match the
        unfused pipeline exactly."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.models.decode import decode_predictions
        from yolo_ms_tpu.ops.nms import batched_nms
        from yolo_ms_tpu.ops.postprocess import fused_postprocess

        nc, reg_max = 7, 16
        rng = np.random.default_rng(5)
        shapes = [(16, 16), (8, 8), (4, 4)]
        raw = [
            jnp.asarray(
                rng.standard_normal((2, h, w, 4 * reg_max + nc)) * 1.5,
                jnp.float32,
            )
            for h, w in shapes
        ]
        # conf 0.25: randn*1.5 logits put ~half the max-scores above the
        # gate -> n_valid >> 256 -> dense branch. conf 0.95: few survive
        # -> prefix branch. Both must equal the unfused pipeline.
        for conf in (0.25, 0.95):
            want = jax.device_get(
                batched_nms(
                    decode_predictions(raw, nc),
                    conf_thresh=conf,
                    pre_nms_topk=512,
                    max_det=50,
                )
            )
            got = jax.device_get(
                fused_postprocess(
                    raw, nc, conf_thresh=conf, pre_nms_topk=512, max_det=50
                )
            )
            np.testing.assert_array_equal(got["valid"], want["valid"])
            v = want["valid"]
            np.testing.assert_array_equal(got["classes"][v], want["classes"][v])
            np.testing.assert_allclose(
                got["boxes"][v], want["boxes"][v], rtol=1e-4, atol=1e-3
            )

    def test_multi_tier_prefix_widths(self):
        """Multi-tier adaptive prefix (r3): planted survivor counts landing
        in every tier band (<=64, <=128, <=256, dense fallback) must give
        identical results for every `prefix_widths` setting — the dispatch
        is exact, only the executed width changes."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.ops.postprocess import fused_postprocess

        nc, reg_max = 7, 16
        no = 4 * reg_max + nc
        shapes = [(16, 16), (8, 8), (4, 4)]  # A = 336
        variants = [(), (64,), (64, 128), (64, 128, 256), (128,)]
        for planted in (30, 100, 200, 300):
            rng = np.random.default_rng(planted)
            maps = [
                rng.standard_normal((2, h, w, no)).astype(np.float32) - 8.0
                for h, w in shapes
            ]
            for bi in range(2):
                ys = rng.integers(0, 16, planted)
                xs = rng.integers(0, 16, planted)
                cs = rng.integers(0, nc, planted)
                maps[0][bi, ys, xs, 4 * reg_max + cs] = 4.0 + rng.random(planted)
            jmaps = [jnp.asarray(m) for m in maps]
            ref = None
            for widths in variants:
                got = jax.device_get(
                    fused_postprocess(
                        jmaps, nc, pre_nms_topk=336, max_det=50,
                        prefix_widths=widths,
                    )
                )
                if ref is None:
                    ref = got
                    continue
                for k in ("boxes", "scores", "classes", "valid"):
                    np.testing.assert_array_equal(
                        got[k], ref[k],
                        err_msg=f"planted={planted} widths={widths} key={k}",
                    )

    def test_bf16_maps(self):
        """The serving path feeds bf16 maps; boxes must come out f32 and
        finite, within 1px of the f32 result."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.ops.postprocess import fused_postprocess

        nc, reg_max = 7, 16
        rng = np.random.default_rng(1)
        shapes = [(16, 16), (8, 8), (4, 4)]
        raw = [
            jnp.asarray(
                rng.standard_normal((2, h, w, 4 * reg_max + nc)) * 1.5,
                jnp.float32,
            )
            for h, w in shapes
        ]
        raw_bf16 = [m.astype(jnp.bfloat16) for m in raw]
        f32 = jax.device_get(fused_postprocess([m.astype(jnp.float32) for m in raw_bf16], nc))
        got = jax.device_get(fused_postprocess(raw_bf16, nc))
        assert got["boxes"].dtype == np.float32
        v = got["valid"] & f32["valid"]
        assert np.abs(got["boxes"][v] - f32["boxes"][v]).max() < 1.0

    def test_split_maps_match_concat(self):
        """The head's split=True serving output ((box, cls) tuples) must
        produce bit-identical detections to the concatenated maps — the
        split path only removes the channel-concat copy, not any math."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.ops.postprocess import fused_postprocess

        nc, reg_max = 80, 16
        rng = np.random.default_rng(3)
        shapes = [(16, 16), (8, 8), (4, 4)]
        raw = [
            jnp.asarray(
                rng.standard_normal((2, h, w, 4 * reg_max + nc)) * 2,
                jnp.float32,
            )
            for h, w in shapes
        ]
        split = [(m[..., : 4 * reg_max], m[..., 4 * reg_max :]) for m in raw]
        for conf in (0.25, 0.95):
            a = jax.device_get(
                fused_postprocess(
                    raw, nc, conf_thresh=conf, pre_nms_topk=128, max_det=30
                )
            )
            b = jax.device_get(
                fused_postprocess(
                    split, nc, conf_thresh=conf, pre_nms_topk=128, max_det=30
                )
            )
            for key in a:
                np.testing.assert_array_equal(a[key], b[key])

    def test_model_split_head_same_maps(self):
        """model.apply(split_head=True) returns per-scale (box, cls) whose
        concat equals the default output."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from yolo_ms_tpu.models.registry import build_model, init_model

        model = build_model("n", num_classes=7)
        variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        cat = model.apply(variables, x, train=False)
        split = model.apply(variables, x, train=False, split_head=True)
        for m, (bx, cl) in zip(cat, split):
            np.testing.assert_array_equal(
                np.asarray(m), np.asarray(jnp.concatenate([bx, cl], axis=-1))
            )
