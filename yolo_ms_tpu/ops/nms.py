"""On-device batched class-aware NMS — fixed shapes, no host round-trip.

The reference runs `torchvision.ops.nms` per class per image inside Python
loops (tools/test.py:192-207, tools/train.py:85-96) — a host-controlled loop
that stalls the accelerator. Here the whole post-process is one jittable
graph:

  decoded [B, A, 4+nc]
    -> max-class score/argmax           (reference: tools/test.py:179)
    -> confidence mask                   (:182-185)
    -> top-K pre-NMS selection           (static shape for XLA)
    -> class-offset trick                (per-class NMS in ONE pass: boxes are
                                          translated by class_id * offset so
                                          boxes of different classes never
                                          overlap — equivalent to per-class
                                          NMS, no loop over classes)
    -> exact greedy suppression          (score-ordered, O(K^2) IoU matrix +
                                          lax.fori_loop scan — bitwise-exact
                                          greedy semantics)
    -> top max_det survivors, padded     (fixed [B, max_det] outputs + mask)

Everything is vmapped over the batch and stays on the TPU; only the final
fixed-size tensors ever cross to the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_ms_tpu.ops.iou import xywh_to_xyxy

# Class-offset stride: larger than any coordinate the model can produce
# (inputs are <= ~2000px; decoded boxes stay within a few x input size).
CLASS_OFFSET = 8192.0


def _pairwise_iou_xyxy(boxes: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """[N,4] -> [N,N] IoU matrix."""
    b1 = boxes[:, None, :]
    b2 = boxes[None, :, :]
    ix1 = jnp.maximum(b1[..., 0], b2[..., 0])
    iy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    ix2 = jnp.minimum(b1[..., 2], b2[..., 2])
    iy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a[:, None] + a[None, :] - inter + eps)


def nms_greedy_scan(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Reference implementation: sequential greedy scan (N fori_loop steps).

    Kept for testing; `nms_fixed` below computes the identical result with
    MXU-friendly iterations.
    """
    n = boxes.shape[0]
    overlap = _pairwise_iou_xyxy(boxes) > iou_thresh
    idx = jnp.arange(n)
    valid = scores > 0.0

    def body(i, keep):
        sup = jnp.any(overlap[i] & keep & (idx < i))
        return keep.at[i].set(keep[i] & ~sup)

    return jax.lax.fori_loop(0, n, body, valid)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Exact greedy NMS over already score-sorted boxes — TPU-native.

    boxes: [N,4] xyxy sorted by descending score; scores: [N] (entries < 0
    mark invalid/padding rows). Returns keep mask [N] (bool). Semantics
    identical to torchvision.ops.nms greedy.

    Algorithm: iterated suppression-matrix refinement. Greedy keep is the
    fixed point of
        keep[i] <- valid[i] and not any_{j<i}(overlap[i,j] and keep[j])
    starting from keep = valid. Each sweep is one [N,N]x[N] masked
    mat-vec (MXU work) instead of N sequential scalar steps; real suppression
    chains are short, so a handful of sweeps converge, and the while_loop
    exits as soon as the mask stops changing (bounded by N sweeps, at which
    point the result equals the sequential greedy scan by induction).
    """
    n = boxes.shape[0]
    iou = _pairwise_iou_xyxy(boxes)
    # strictly-lower-triangular overlap: j < i contributes to suppressing i
    tri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) < jax.lax.broadcasted_iota(
        jnp.int32, (n, n), 0
    )
    # bf16 storage is exact here: entries are 0/1, products are 0/1, and the
    # mat-vec accumulates in f32 (preferred_element_type), so the `> 0` test
    # below is bit-identical to an f32 matrix — at half the HBM traffic per
    # suppression sweep (the [N, N] matrix is re-read every sweep).
    overlap = ((iou > iou_thresh) & tri).astype(jnp.bfloat16)
    valid = scores > 0.0

    def cond(state):
        keep, prev, it = state
        return (it < n) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = (
            jnp.matmul(
                overlap,
                keep.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            > 0.0
        )
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32))
    )
    return keep


@partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "pre_nms_topk", "max_det", "class_aware"),
)
def batched_nms(
    preds: jnp.ndarray,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    pre_nms_topk: int = 1024,
    max_det: int = 300,
    class_aware: bool = True,
):
    """Full post-process for decoded predictions [B, A, 4+nc].

    Box layout per the decode contract (models/decode.py): (cx,cy,w,h) pixels
    then nc sigmoid class scores. Matches the reference pipeline
    tools/test.py:167-218 (max-class score -> conf threshold -> per-class NMS)
    with fixed-shape outputs:

    Returns dict with 'boxes' [B,K,4] xyxy, 'scores' [B,K], 'classes' [B,K]
    (int32), 'valid' [B,K] (bool), K = max_det. Invalid rows have score -1.
    """
    nc = preds.shape[-1] - 4

    def single(p):
        boxes = xywh_to_xyxy(p[:, :4])
        cls_scores = p[:, 4:]
        scores = jnp.max(cls_scores, axis=-1)
        classes = jnp.argmax(cls_scores, axis=-1)
        # Confidence gate (reference uses strict >, tools/test.py:182).
        scores = jnp.where(scores > conf_thresh, scores, -1.0)

        k = min(pre_nms_topk, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        # Gather rows via one-hot matmul — TPU gathers are slow (measured
        # ~20% of the NMS cost); the [k, A] x [A, 5] contraction rides the
        # MXU instead. Class ids round-trip through f32 exactly (nc << 2^24).
        sel = jax.nn.one_hot(top_idx, scores.shape[0], dtype=jnp.float32)
        data = jnp.concatenate(
            [boxes, classes[:, None].astype(jnp.float32)], axis=-1
        )  # [A, 5]
        # HIGHEST precision: this matmul is a gather, so the inputs must not
        # be rounded to bf16 (the TPU default for f32 matmuls) — that would
        # corrupt the gathered box coordinates by up to a few pixels at 640.
        top = jnp.matmul(sel, data, precision=jax.lax.Precision.HIGHEST)  # [k, 5]
        top_boxes = top[:, :4]
        top_classes = jnp.round(top[:, 4]).astype(jnp.int32)

        if class_aware and nc > 1:
            shifted = top_boxes + (top_classes[:, None].astype(top_boxes.dtype) * CLASS_OFFSET)
        else:
            shifted = top_boxes
        keep = nms_fixed(shifted, top_scores, iou_thresh)
        kept_scores = jnp.where(keep, top_scores, -1.0)

        kd = min(max_det, k)
        out_scores, out_idx = jax.lax.top_k(kept_scores, kd)
        sel2 = jax.nn.one_hot(out_idx, k, dtype=jnp.float32)
        out = jnp.matmul(sel2, top, precision=jax.lax.Precision.HIGHEST)  # [kd, 5]
        out_boxes = out[:, :4]
        out_classes = jnp.round(out[:, 4]).astype(jnp.int32)
        valid = out_scores > 0.0
        if kd < max_det:
            pad = max_det - kd
            out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
            out_scores = jnp.pad(out_scores, (0, pad), constant_values=-1.0)
            out_classes = jnp.pad(out_classes, (0, pad))
            valid = jnp.pad(valid, (0, pad))
        return {
            "boxes": out_boxes,
            "scores": out_scores,
            "classes": out_classes.astype(jnp.int32),
            "valid": valid,
        }

    return jax.vmap(single)(preds)
