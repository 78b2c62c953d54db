"""Detection loss tests: finiteness, gradients, synthetic-GT behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_ms_tpu.train.loss import DetectionLoss, _bce_logits, _dfl_loss


def make_raw_maps(rng, b=2, img=64, nc=3, reg_max=16):
    shapes = [img // s for s in (8, 16, 32)]
    no = 4 * reg_max + nc
    keys = jax.random.split(rng, 3)
    return [
        jax.random.normal(k, (b, s, s, no)) * 0.1 for k, s in zip(keys, shapes)
    ]


def make_gt(b=2, m=4):
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    # one gt in image 0, two in image 1 (normalized cxcywh)
    boxes[0, 0] = [0.5, 0.5, 0.4, 0.4]
    labels[0, 0] = 1
    mask[0, 0] = True
    boxes[1, 0] = [0.25, 0.25, 0.3, 0.3]
    boxes[1, 1] = [0.75, 0.75, 0.2, 0.4]
    labels[1, 0], labels[1, 1] = 0, 2
    mask[1, 0] = mask[1, 1] = True
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)


class TestDFLHelper:
    def test_two_bin_soft_label(self):
        """Target 3.25 -> 0.75*CE(bin3) + 0.25*CE(bin4)."""
        logits = jnp.asarray(np.random.default_rng(0).standard_normal((5, 16)), jnp.float32)
        t = jnp.full((5,), 3.25)
        got = np.asarray(_dfl_loss(logits, t, 16))
        logp = np.asarray(jax.nn.log_softmax(logits, -1))
        expect = -(logp[:, 3] * 0.75 + logp[:, 4] * 0.25)
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_integer_target_single_bin(self):
        logits = jnp.zeros((1, 16))
        got = float(_dfl_loss(logits, jnp.asarray([5.0]), 16)[0])
        assert abs(got - np.log(16)) < 1e-5

    def test_clamps_out_of_range(self):
        logits = jnp.zeros((2, 16))
        out = _dfl_loss(logits, jnp.asarray([-3.0, 99.0]), 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_fused_ce_matches_reference_form(self):
        """The shared-pass CE (r3: one exp/contract pass for expectation AND
        log-normalizer) must equal _dfl_loss, and the shared expectation must
        equal nn.blocks.dfl_expectation."""
        from yolo_ms_tpu.nn.blocks import dfl_expectation
        from yolo_ms_tpu.train.loss import _dfl_ce_from_logz, _dfl_expectation_logz

        rng = np.random.default_rng(7)
        dist = jnp.asarray(
            rng.standard_normal((3, 11, 4, 16)) * 3.0, jnp.float32
        )
        target = jnp.asarray(rng.uniform(-1.0, 17.0, (3, 11, 4)), jnp.float32)
        ltrb, logz = _dfl_expectation_logz(dist)
        np.testing.assert_allclose(
            np.asarray(ltrb), np.asarray(dfl_expectation(dist)), rtol=1e-6
        )
        got = np.asarray(_dfl_ce_from_logz(dist, logz, target, 16))
        want = np.asarray(_dfl_loss(dist, target, 16))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

        # bf16 input path (the training maps' dtype): still finite + close
        ltrb16, logz16 = _dfl_expectation_logz(dist.astype(jnp.bfloat16))
        got16 = np.asarray(
            _dfl_ce_from_logz(dist.astype(jnp.bfloat16), logz16, target, 16)
        )
        assert np.all(np.isfinite(got16))
        np.testing.assert_allclose(got16, want, rtol=0.05, atol=0.05)


def test_bce_logits_matches_stable_formula():
    x = jnp.asarray([-5.0, 0.0, 5.0])
    t = jnp.asarray([0.0, 0.5, 1.0])
    got = np.asarray(_bce_logits(x, t))
    p = 1 / (1 + np.exp(-np.asarray(x)))
    expect = -(np.asarray(t) * np.log(p) + (1 - np.asarray(t)) * np.log(1 - p))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


class TestDetectionLoss:
    @pytest.fixture
    def loss_fn(self):
        return DetectionLoss(num_classes=3)

    def test_finite_and_components(self, loss_fn):
        raw = make_raw_maps(jax.random.PRNGKey(0))
        boxes, labels, mask = make_gt()
        total, metrics = loss_fn(raw, boxes, labels, mask)
        assert np.isfinite(float(total))
        for k in ("loss_box", "loss_cls", "loss_dfl"):
            assert np.isfinite(float(metrics[k])) and float(metrics[k]) >= 0
        assert float(metrics["num_fg"]) > 0

    def test_no_gt_only_cls_loss(self, loss_fn):
        raw = make_raw_maps(jax.random.PRNGKey(1))
        boxes = jnp.zeros((2, 4, 4))
        labels = jnp.zeros((2, 4), jnp.int32)
        mask = jnp.zeros((2, 4), bool)
        total, metrics = loss_fn(raw, boxes, labels, mask)
        assert float(metrics["num_fg"]) == 0
        assert float(metrics["loss_box"]) == 0.0
        assert float(metrics["loss_dfl"]) == 0.0
        assert float(metrics["loss_cls"]) > 0.0
        assert np.isfinite(float(total))

    def test_gradients_flow_and_finite(self, loss_fn):
        raw = make_raw_maps(jax.random.PRNGKey(2))
        boxes, labels, mask = make_gt()

        def f(maps):
            return loss_fn(maps, boxes, labels, mask)[0]

        grads = jax.grad(f)(raw)
        for g in grads:
            ga = np.asarray(g)
            assert np.all(np.isfinite(ga))
            assert np.abs(ga).sum() > 0

    def test_jit_compatible(self, loss_fn):
        raw = make_raw_maps(jax.random.PRNGKey(3))
        boxes, labels, mask = make_gt()
        total_eager = float(loss_fn(raw, boxes, labels, mask)[0])
        total_jit = float(jax.jit(lambda r: loss_fn(r, boxes, labels, mask)[0])(raw))
        assert abs(total_eager - total_jit) < 1e-3

    def test_loss_decreases_under_gradient_descent(self):
        """Optimizing the raw maps against a fixed GT must reduce the loss —
        the end-to-end sanity property (assignment + decode + all three loss
        terms are consistent and differentiable)."""
        loss_fn = DetectionLoss(num_classes=3)
        boxes, labels, mask = make_gt()
        maps = make_raw_maps(jax.random.PRNGKey(5))

        @jax.jit
        def step(ms):
            (loss, _), grads = jax.value_and_grad(
                lambda m: loss_fn(m, boxes, labels, mask), has_aux=True
            )(ms)
            return loss, [m - 0.5 * g for m, g in zip(ms, grads)]

        first, maps = step(maps)
        for _ in range(20):
            loss, maps = step(maps)
        assert float(loss) < float(first) * 0.8, (float(first), float(loss))

    def test_focal_variant(self):
        loss_fn = DetectionLoss(num_classes=3, use_focal=True, alpha=0.25, gamma=1.5)
        raw = make_raw_maps(jax.random.PRNGKey(4))
        boxes, labels, mask = make_gt()
        total, metrics = loss_fn(raw, boxes, labels, mask)
        assert np.isfinite(float(total))


class TestAssignmentDetached:
    def test_cls_gradient_is_pure_bce(self):
        """With the assigner detached (ultralytics semantics), the ONLY path
        from cls logits to the loss is the BCE term, so
        d(total)/d(cls_logits) == cls_weight * (sigmoid - target_scores)/tss
        exactly. If assignment leaks gradient (the round-1 defect: a term
        measured ~135x the intended one), this identity breaks."""
        from yolo_ms_tpu.models.decode import (
            decode_boxes_xyxy,
            flatten_maps,
            make_anchors,
        )
        from yolo_ms_tpu.ops.iou import xywh_to_xyxy
        from yolo_ms_tpu.train.assigner import task_aligned_assign

        nc, reg_max = 3, 16
        loss_fn = DetectionLoss(num_classes=nc)
        raw = make_raw_maps(jax.random.PRNGKey(7), nc=nc)
        boxes, labels, mask = make_gt()

        grads = jax.grad(lambda m: loss_fn(m, boxes, labels, mask)[0])(raw)

        # recompute the targets exactly as the loss does
        shapes = [(m.shape[1], m.shape[2]) for m in raw]
        img = shapes[0][0] * 8
        anchors, stride_t = make_anchors(shapes, (8, 16, 32))
        box_dist, cls_logits = flatten_maps(raw, nc, reg_max)
        pd_scores = jax.nn.sigmoid(cls_logits)
        pd_boxes = decode_boxes_xyxy(box_dist, anchors, stride_t)
        scale = jnp.asarray([img, img, img, img], jnp.float32)
        _, _, target_scores, _ = task_aligned_assign(
            pd_scores,
            pd_boxes,
            anchors * stride_t,
            labels,
            xywh_to_xyxy(boxes * scale),
            mask,
            num_classes=nc,
        )
        tss = jnp.maximum(target_scores.sum(), 1.0)
        expected_flat = loss_fn.cls_weight * (pd_scores - target_scores) / tss

        # compare per level, cls channels only
        offset = 0
        for lvl, g in enumerate(grads):
            b, h, w, _ = g.shape
            got = np.asarray(g[..., 4 * reg_max :]).reshape(b, h * w, nc)
            want = np.asarray(expected_flat[:, offset : offset + h * w])
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)
            offset += h * w


class TestIouType:
    def test_variants_run_and_differ(self):
        # Strong logits -> varied pred boxes that only partially overlap the
        # GTs, so all four IoU definitions give distinct box losses. (With
        # near-zero logits every pred box contains the GT and GIoU == IoU
        # exactly: enclose == union.)
        raw = [m * 30.0 for m in make_raw_maps(jax.random.PRNGKey(8))]
        boxes, labels, mask = make_gt()
        vals = {}
        for kind in ("iou", "giou", "diou", "ciou"):
            loss_fn = DetectionLoss(num_classes=3, iou_type=kind)
            total, m = loss_fn(raw, boxes, labels, mask)
            assert np.isfinite(float(total)), kind
            vals[kind] = float(m["loss_box"])
        # the four IoU definitions give different box losses on random preds
        assert len({round(v, 6) for v in vals.values()}) == 4, vals

    def test_invalid_raises(self):
        raw = make_raw_maps(jax.random.PRNGKey(9))
        boxes, labels, mask = make_gt()
        with pytest.raises(ValueError, match="iou_type"):
            DetectionLoss(num_classes=3, iou_type="bogus")(raw, boxes, labels, mask)
