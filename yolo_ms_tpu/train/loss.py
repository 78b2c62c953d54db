"""Detection loss: TAL assignment + CIoU box + BCE cls + DFL losses.

Implements the *intended* loss spec of the reference (SURVEY.md §3.1): the
reference wires in a shape-broken SimplifiedYOLOLoss (simplified_loss.py:44
misreads the head's raw DFL channel layout), while its "real" DFL-aware loss
(loss.py:94-677) is unwired and per-image-looped. This module is the
vectorized, jit-compatible version of that real spec:

- consumes the head's raw maps (3 x [B,H,W,4*reg_max+nc]) directly,
- TAL assignment over padded GT [B, M, 5] + mask (no dynamic shapes),
- box loss: (1 - CIoU) weighted by target scores (loss.py:558-562 semantics,
  ultralytics-style normalization by total target score),
- cls loss: BCE-with-logits over ALL anchors vs TAL soft labels
  (loss.py:112,551),
- DFL loss: cross-entropy with two-bin soft labels on stride-normalized ltrb
  distances (loss.py:617-648),
- weights lambda_box=7.5, lambda_cls=0.5, lambda_dfl=1.5 (loss.py:118-120 and
  config knobs coco_yolov8.yaml:79-84).

Also provides the focal-loss classification variant with the reference's
(alpha, gamma) knobs from SimplifiedYOLOLoss (simplified_loss.py:128-143) for
config parity.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from yolo_ms_tpu.models.decode import (
    DEFAULT_STRIDES,
    flatten_maps,
    make_anchors,
)
from yolo_ms_tpu.ops.iou import bbox_iou, xywh_to_xyxy
from yolo_ms_tpu.train.assigner import task_aligned_assign


@dataclasses.dataclass(frozen=True)
class DetectionLoss:
    """Loss configuration (config schema parity: loss + training sections)."""

    num_classes: int
    reg_max: int = 16
    strides: Sequence[int] = DEFAULT_STRIDES
    box_weight: float = 7.5
    cls_weight: float = 0.5
    dfl_weight: float = 1.5
    # focal-loss knobs (applied when use_focal=True; simplified_loss.py:12-22)
    use_focal: bool = False
    alpha: float = 0.25
    gamma: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    # box-loss IoU variant: iou | giou | diou | ciou (reference loss.py:95,118
    # parameterizes its DFL-aware loss the same way; assignment always uses
    # CIoU like ultralytics TAL)
    iou_type: str = "ciou"

    def __call__(self, raw_maps, gt_boxes, gt_labels, gt_mask):
        return detection_loss(
            raw_maps,
            gt_boxes,
            gt_labels,
            gt_mask,
            num_classes=self.num_classes,
            reg_max=self.reg_max,
            strides=tuple(self.strides),
            box_weight=self.box_weight,
            cls_weight=self.cls_weight,
            dfl_weight=self.dfl_weight,
            use_focal=self.use_focal,
            alpha=self.alpha,
            gamma=self.gamma,
            tal_topk=self.tal_topk,
            tal_alpha=self.tal_alpha,
            tal_beta=self.tal_beta,
            iou_type=self.iou_type,
        )


def _bce_logits(logits, targets):
    """Elementwise BCE with logits (stable form)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _dfl_loss(dist_logits, target, reg_max):
    """Two-bin soft-label cross-entropy (loss.py:617-648).

    dist_logits: [..., reg_max]; target: [...] continuous in [0, reg_max-1].

    The two-hot target is built by comparing against a bin iota instead of
    gathering log-probs with take_along_axis — TPU gathers measured 37 ms
    for this op at [32, 8400, 4, 16] vs ~2 ms for the elementwise form.
    """
    target = jnp.clip(target, 0.0, reg_max - 1 - 1e-3)
    tl = jnp.floor(target)
    wr = target - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(dist_logits, axis=-1)
    bins = jnp.arange(reg_max, dtype=dist_logits.dtype)
    two_hot = (
        wl[..., None] * (bins == tl[..., None])
        + wr[..., None] * (bins == tl[..., None] + 1.0)
    )
    return -(two_hot * logp).sum(-1)


def _dfl_expectation_logz(dist: jax.Array):
    """ONE shared pass over [B, A, 4, reg_max]: DFL expectation AND the
    per-side log-normalizer.

    The train step previously ran this tensor twice — once through
    ``dfl_expectation`` (box decode for CIoU) and once through
    ``log_softmax`` (DFL cross-entropy) — two independent exp/reduce chains
    over the step's largest f32 activation (measured 4.6 + 2.3 ms/step at
    bs=128, benchmarks/profile_train.py). Both derive from the same shifted
    exponentials: with e = exp(max(x - c, -60)) and the lane-friendly
    [4*reg_max, 8] contraction of nn.blocks.dfl_expectation producing
    per-side numerators/denominators,

        expectation_i = num_i / den_i
        logZ_i        = log(den_i) + c          (log-sum-exp per side)
        CE(two_hot)   = logZ_i - (two_hot * x_i).sum   (since wl + wr = 1)

    so the cross-entropy needs no second softmax pass. Returns
    (ltrb [B,A,4] f32, logz [B,A,4] f32). Same -60 clamp semantics as
    nn.blocks.dfl_expectation.
    """
    *lead, k, reg_max = dist.shape
    x = dist.astype(jnp.float32).reshape(*lead, k * reg_max)
    c = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(jnp.maximum(x - c, -60.0))
    idx = jnp.arange(k * reg_max)
    seg = (idx[:, None] // reg_max == jnp.arange(k)[None, :]).astype(jnp.float32)
    rhs = jnp.concatenate([seg * (idx % reg_max)[:, None], seg], axis=1)
    out = jnp.einsum(
        "...i,ij->...j", e, rhs, precision=jax.lax.Precision.HIGHEST
    )
    ltrb = out[..., :k] / out[..., k:]
    logz = jnp.log(out[..., k:]) + c
    return ltrb, logz


def _dfl_ce_from_logz(dist_logits, logz, target, reg_max):
    """Two-bin soft-label CE using a precomputed per-side log-normalizer.

    Equals ``_dfl_loss`` (the directly-tested reference form) without its
    log_softmax pass: CE = logZ - wl*x[tl] - wr*x[tl+1].
    """
    target = jnp.clip(target, 0.0, reg_max - 1 - 1e-3)
    tl = jnp.floor(target)
    wr = target - tl
    wl = 1.0 - wr
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    two_hot = (
        wl[..., None] * (bins == tl[..., None])
        + wr[..., None] * (bins == tl[..., None] + 1.0)
    )
    picked = (two_hot * dist_logits.astype(jnp.float32)).sum(-1)
    return logz - picked


def detection_loss(
    raw_maps: Sequence[jax.Array],
    gt_boxes: jax.Array,  # [B, M, 4] (cx,cy,w,h) normalized 0-1 (dataset contract)
    gt_labels: jax.Array,  # [B, M] int32
    gt_mask: jax.Array,  # [B, M] bool
    *,
    num_classes: int,
    reg_max: int = 16,
    strides: tuple = DEFAULT_STRIDES,
    box_weight: float = 7.5,
    cls_weight: float = 0.5,
    dfl_weight: float = 1.5,
    use_focal: bool = False,
    alpha: float = 0.25,
    gamma: float = 1.5,
    tal_topk: int = 10,
    tal_alpha: float = 0.5,
    tal_beta: float = 6.0,
    iou_type: str = "ciou",
):
    """Returns (total_loss, metrics dict with loss_box/loss_cls/loss_dfl).

    GT boxes arrive normalized to [0,1] in (cx,cy,w,h) — the dataset target
    contract of the reference (dataset.py:219-227); they are scaled to input
    pixels here using the strides x feature shapes.
    """
    shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    img_h = shapes[0][0] * strides[0]
    img_w = shapes[0][1] * strides[0]
    compute_dtype = jnp.float32

    anchors, stride_t = make_anchors(shapes, strides, dtype=compute_dtype)
    # flatten in the maps' NATIVE dtype (bf16 on the training path): the
    # f32 pre-cast made the [B, A, 4*reg_max+nc] concat write f32 — 2x the
    # HBM traffic of the step's largest activation. Consumers cast at their
    # reduction points below (numerically identical: same values, cast
    # before every f32 computation).
    box_dist, cls_logits = flatten_maps(raw_maps, num_classes, reg_max)
    cls_logits = cls_logits.astype(compute_dtype)
    # anchor points in pixels for assignment
    anchors_px = anchors * stride_t

    pd_scores = jax.nn.sigmoid(cls_logits)  # [B, A, nc]
    # ONE shared exp/contract pass gives both the box expectation (CIoU
    # path) and the DFL log-normalizer (CE path) — see _dfl_expectation_logz
    ltrb_px, dfl_logz = _dfl_expectation_logz(box_dist)
    x1y1 = anchors[None] - ltrb_px[..., :2]
    x2y2 = anchors[None] + ltrb_px[..., 2:]
    pd_boxes_px = (
        jnp.concatenate([x1y1, x2y2], axis=-1) * stride_t[None]
    )  # [B, A, 4] xyxy (decode_boxes_xyxy semantics)

    # GT to pixel xyxy
    scale = jnp.asarray([img_w, img_h, img_w, img_h], dtype=compute_dtype)
    gt_xyxy = xywh_to_xyxy(gt_boxes.astype(compute_dtype) * scale)

    # Assignment is a label-generation step, not part of the differentiable
    # graph: detach predictions before assigning (ultralytics semantics —
    # without this, target_scores/weights carry a gradient term measured
    # ~135x larger than the intended detached loss gradient).
    _, target_bboxes, target_scores, fg_mask = task_aligned_assign(
        jax.lax.stop_gradient(pd_scores),
        jax.lax.stop_gradient(pd_boxes_px),
        anchors_px,
        gt_labels,
        gt_xyxy,
        gt_mask,
        num_classes=num_classes,
        topk=tal_topk,
        alpha=tal_alpha,
        beta=tal_beta,
    )

    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # --- cls loss over all anchors ---
    if use_focal:
        p = jax.nn.sigmoid(cls_logits)
        ce = _bce_logits(cls_logits, target_scores)
        p_t = p * target_scores + (1 - p) * (1 - target_scores)
        alpha_t = alpha * target_scores + (1 - alpha) * (1 - target_scores)
        loss_cls = (alpha_t * (1 - p_t) ** gamma * ce).sum() / target_scores_sum
    else:
        loss_cls = _bce_logits(cls_logits, target_scores).sum() / target_scores_sum

    # --- box loss on fg anchors, weighted by target score ---
    weight = target_scores.sum(-1) * fg_mask  # [B, A]
    kind = iou_type.lower()
    if kind not in ("iou", "giou", "diou", "ciou"):
        raise ValueError(f"Unsupported iou_type: {iou_type}")
    iou = bbox_iou(
        pd_boxes_px,
        target_bboxes,
        xywh=False,
        GIoU=kind == "giou",
        DIoU=kind == "diou",
        CIoU=kind == "ciou",
    )
    loss_box = ((1.0 - iou) * weight).sum() / target_scores_sum

    # --- DFL loss on fg anchors ---
    # targets: distances from anchor center to assigned box sides, / stride
    tb = target_bboxes / stride_t[None]
    ap = anchors[None]
    t_ltrb = jnp.stack(
        [
            ap[..., 0] - tb[..., 0],
            ap[..., 1] - tb[..., 1],
            tb[..., 2] - ap[..., 0],
            tb[..., 3] - ap[..., 1],
        ],
        axis=-1,
    )  # [B, A, 4]
    dfl = _dfl_ce_from_logz(box_dist, dfl_logz, t_ltrb, reg_max).mean(-1)  # [B, A]
    loss_dfl = (dfl * weight).sum() / target_scores_sum

    total = box_weight * loss_box + cls_weight * loss_cls + dfl_weight * loss_dfl
    metrics = {
        "loss_box": loss_box,
        "loss_cls": loss_cls,
        "loss_dfl": loss_dfl,
        "total_loss": total,
        "num_fg": fg_mask.sum(),
    }
    return total, metrics
