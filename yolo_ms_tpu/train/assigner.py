"""Task-Aligned assigner — dense, fully vectorized, jit-compatible.

The reference's assigner is an admitted placeholder (loss.py:221-373 with the
TODO at loss.py:774-775: "a proper TaskAlignedAssigner is needed"). This is
that proper assigner, built for XLA: no per-image Python loops
(loss.py:447 anti-pattern), no boolean indexing — everything is dense
[B, M, A] masks over padded ground truth.

Algorithm (task-aligned learning):
  1. alignment metric  t = score^alpha * iou^beta  per (gt, anchor)
  2. candidate anchors = centers inside the gt box
  3. top-k candidates per gt by metric
  4. conflicts (anchor claimed by >1 gt) resolved to the gt with highest IoU
  5. targets: assigned gt box/label per anchor; target scores are the one-hot
     class scaled by the normalized alignment metric (TAL soft labels)

Shapes: B batch, M max_gt (padded; mask_gt marks real rows), A anchors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolo_ms_tpu.ops.iou import bbox_iou

# Probe-only hook (benchmarks/assigner_barrier_probe.py): isolate the
# cls-score contraction from its elementwise consumers. Measured 31% WORSE
# as a default (see the dead-end note at the einsum below) — never enable
# in production code; read at trace time.
_PROBE_CLS_DOT_BARRIER = False

# Trace-time A/B variants (benchmarks/r5_assigner_ab.py; VERDICT r4 item 1).
# Every variant is bit-identical to the default by construction
# (tests/test_assigner_variants.py asserts exact equality); the flags pick
# which lowering the jit trace emits.
#   _VARIANT_CLS:  "einsum" (default) | "pad128" | "swap" | "gather"
#   _VARIANT_TOPK: "argmax" (default) | "block"
_VARIANT_CLS = "einsum"
_VARIANT_TOPK = "argmax"
# Block size for the "block" top-k: the largest divisor of A in [64, 512]
# closest to 256 (8400 anchors -> 336x25 blocks).
_BLOCK_S_RANGE = (64, 512)


def _pick_block_s(a: int) -> int | None:
    lo, hi = _BLOCK_S_RANGE
    best = None
    for s in range(lo, min(hi, a - 1) + 1):
        # s == a would make ONE block (the hierarchy degenerates to the
        # flat argmax with extra gathers) — require at least two blocks
        if a % s == 0 and 2 * s <= a and (
            best is None or abs(s - 256) < abs(best - 256)
        ):
            best = s
    return best


@partial(jax.jit, static_argnames=("topk", "alpha", "beta", "num_classes"))
def task_aligned_assign(
    pd_scores: jnp.ndarray,  # [B, A, nc] sigmoid class scores
    pd_bboxes: jnp.ndarray,  # [B, A, 4] decoded boxes, xyxy, pixels
    anchor_points: jnp.ndarray,  # [A, 2] anchor centers, pixels
    gt_labels: jnp.ndarray,  # [B, M] int class ids (padding rows arbitrary)
    gt_bboxes: jnp.ndarray,  # [B, M, 4] xyxy pixels (padding rows zeros)
    mask_gt: jnp.ndarray,  # [B, M] bool validity of gt rows
    num_classes: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns (target_labels [B,A], target_bboxes [B,A,4],
    target_scores [B,A,nc], fg_mask [B,A] bool)."""
    a = pd_scores.shape[1]
    m = gt_bboxes.shape[1]

    # --- candidate mask: anchor center strictly inside gt box [B, M, A] ---
    # Written as four broadcast compares ANDed on [B, M, A] directly: the
    # r2 form (lt/rb stacks + .min(-1) over a trailing 2-wide axis) built
    # [B, M, A, 2] f32 intermediates — 1.1 GB each at bs=128/max_gt=128 and
    # a lane-hostile trailing axis (3.2 ms of the r3 train profile).
    ax = anchor_points[None, None, :, 0]  # [1,1,A]
    ay = anchor_points[None, None, :, 1]
    in_gts = (
        (ax - gt_bboxes[..., None, 0] > eps)
        & (ay - gt_bboxes[..., None, 1] > eps)
        & (gt_bboxes[..., None, 2] - ax > eps)
        & (gt_bboxes[..., None, 3] - ay > eps)
    )  # [B, M, A]
    mask_in = in_gts & mask_gt[..., None]

    # --- alignment metric [B, M, A] ---
    # The [B, M, A] intermediates only drive RANKING (candidate top-k,
    # conflict argmax) and the soft-label normalization; none feed exact
    # target coordinates. They are computed in f32 but STORED bf16: at
    # max_gt=128/bs=128 each f32 tensor is 550 MB and the assigner is
    # HBM-bound, so halving the working set is the lever. bf16's ~0.4%
    # relative rounding can only reorder near-tied candidates / perturb the
    # TAL soft labels by <1%, both far below training noise (the slow
    # learning test passes identically).
    ious = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
    )
    ious = jnp.clip(ious, 0.0).astype(jnp.bfloat16)
    gt_cls = jnp.clip(gt_labels, 0, num_classes - 1).astype(jnp.int32)
    gt_cls_onehot = jax.nn.one_hot(gt_cls, num_classes, dtype=pd_scores.dtype)
    # score of each anchor for its gt's class, as an MXU contraction (TPU
    # gathers are slow): [B,A,nc] x [B,M,nc] -> [B,M,A]. Emitted directly
    # in bf16 (accumulation is still f32 on the MXU) so the [B,M,A] f32
    # intermediate never reaches HBM.
    if _VARIANT_CLS == "pad128":
        # pad the contraction axis nc -> next multiple of 128 (the MXU tile)
        # with zeros — exact: trailing f32-accumulated zeros change nothing
        ncp = -(-num_classes // 128) * 128
        cls_scores = jnp.einsum(
            "ban,bmn->bma",
            jnp.pad(pd_scores, ((0, 0), (0, 0), (0, ncp - num_classes))),
            jax.nn.one_hot(gt_cls, ncp, dtype=pd_scores.dtype),
            preferred_element_type=jnp.bfloat16,
        )
    elif _VARIANT_CLS == "swap":
        # operand order swap — lets XLA's layout assignment see the small
        # [B,M,nc] operand first
        cls_scores = jnp.einsum(
            "bmn,ban->bma",
            gt_cls_onehot,
            pd_scores,
            preferred_element_type=jnp.bfloat16,
        )
    elif _VARIANT_CLS == "gather":
        # dynamic gather instead of the MXU contraction: transpose scores to
        # [B,nc,A] (contiguous A rows), pull each gt's class row
        pt = pd_scores.swapaxes(1, 2)  # [B, nc, A]
        cls_scores = jnp.take_along_axis(
            pt, gt_cls[:, :, None], axis=1
        ).astype(jnp.bfloat16)
    else:
        cls_scores = jnp.einsum(
            "ban,bmn->bma",
            pd_scores,
            gt_cls_onehot,
            preferred_element_type=jnp.bfloat16,
        )
    # Measured dead end (r3, benchmarks/assigner_barrier_probe.py): this dot
    # profiles at only ~5 TFLOP/s fused with the metric pow/where epilogue
    # (4.4 ms), but an optimization_barrier isolating it made the whole step
    # 31% SLOWER (116 -> 152 ms at n/bs=128/max_gt=128) — the fusion avoids
    # materializing + re-reading the 275 MB [B,M,A] intermediate, which is
    # worth more than a clean MXU emitter. It also keeps f32 dot
    # accumulations flowing into the metric before the bf16 rounding.
    if _PROBE_CLS_DOT_BARRIER:
        cls_scores = jax.lax.optimization_barrier(cls_scores)
    metric = (cls_scores.astype(jnp.float32) ** alpha) * (
        ious.astype(jnp.float32) ** beta
    )
    metric = jnp.where(mask_in, metric, 0.0).astype(jnp.bfloat16)

    # --- top-k per gt [B, M, A] -> mask of selected anchors ---
    # Iterative max-and-mask instead of lax.top_k: top_k sorts the whole
    # anchor axis (the single most expensive op of the loss on TPU — the
    # sort dominated the loss at ~3x the model forward cost); k passes of
    # argmax+scatter are linear and fuse. The loop state is bf16: at
    # max_gt=128/bs=128 the [B, M, A] tensor is 550 MB f32 and the k
    # re-read/re-write passes dominate the assigner (measured ~14 ms of a
    # 137 ms step); ranking on bf16-rounded metrics only reorders
    # candidates within ~0.4% of each other — the selected set is the same
    # for any non-degenerate geometry, and every downstream target gather
    # stays exact f32. Selected indices are collected and the dense mask is
    # built in ONE fused pass at the end (instead of k passes over a bool
    # [B, M, A] accumulator).
    #
    # Measured dead end (r3): ONE lax.approx_max_k (TPU PartialReduce) pass
    # instead of the k argmax passes made the whole train step 66% SLOWER
    # (221 vs 132.8 ms at bs=128/max_gt=128) — PartialReduce wins on the
    # serving tail's [B, A] shape (128 rows) but collapses on this
    # [B*M, A] = [16384, 8400] row count, while XLA fuses the k argmax
    # passes into the surrounding elementwise work.
    k = min(topk, a)
    col = jax.lax.broadcasted_iota(jnp.int32, metric.shape, metric.ndim - 1)
    neg = jnp.bfloat16(-1.0)
    picked: list = []

    block_s = _pick_block_s(a) if _VARIANT_TOPK == "block" else None
    if block_s is not None:
        # Hierarchical two-level top-k: the k flat argmax passes each re-read
        # the whole [B, M, A] metric (10 x 275 MB at bs=128/max_gt=128); here
        # ONE full-read pass builds per-block maxima [B, M, G], and each of
        # the k picks then touches only the winning block ([B, M, S] gather +
        # tiny [B, M, G] updates). Bit-identical tie-breaking: argmax over
        # block maxima returns the LOWEST block holding the global max, and
        # the in-block argmax the lowest offset — together the lowest global
        # index, exactly the flat argmax's choice.
        g_cnt = a // block_s
        mb = metric.reshape(*metric.shape[:-1], g_cnt, block_s)
        blockmax = mb.max(axis=-1)  # [B, M, G] — the one full read
        iota_g = jax.lax.broadcasted_iota(jnp.int32, blockmax.shape, 2)
        iota_s = jax.lax.broadcasted_iota(
            jnp.int32, (*metric.shape[:-1], block_s), 2
        )
        for _ in range(k):
            g = jnp.argmax(blockmax, axis=-1)  # [B, M]
            blk = jnp.take_along_axis(mb, g[..., None, None], axis=2)[
                ..., 0, :
            ]  # [B, M, S]
            base = g * block_s
            for p in picked:
                # mask earlier picks landing in this block (p - base outside
                # [0, S) when the pick was in another block -> no match)
                blk = jnp.where(iota_s == (p - base)[..., None], neg, blk)
            s_loc = jnp.argmax(blk, axis=-1)  # [B, M]
            picked.append(base + s_loc)
            # the picked block's max with the new pick masked out
            newmax = jnp.where(iota_s == s_loc[..., None], neg, blk).max(-1)
            blockmax = jnp.where(
                iota_g == g[..., None], newmax[..., None], blockmax
            )
        masked_final = metric
        for p in picked:
            masked_final = jnp.where(col == p[..., None], neg, masked_final)
        sel = (masked_final < jnp.bfloat16(0)) & (metric > eps)
        mask_pos = sel & mask_in
    else:

        def masked_metric():
            # metric with every already-picked position replaced by -1,
            # built as a chain of j inline wheres that XLA fuses INTO the
            # consuming reduce. The r2/r3 loop instead wrote the masked
            # tensor back each iteration — 10 extra [B, M, A] HBM writes
            # (275 MB each at bs=128/max_gt=128); the
            # compare-against-j-indices form re-reads only the original
            # metric. O(k^2/2) extra VPU compares, which ride the
            # memory-bound reduce for free.
            m_ = metric
            for p in picked:
                m_ = jnp.where(col == p[..., None], neg, m_)
            return m_

        for _ in range(k):
            picked.append(jnp.argmax(masked_metric(), axis=-1))  # [B, M]
        # The final masked metric encodes the selection directly: metric
        # >= 0 everywhere (cls^a * iou^b, zeroed outside mask_in) and
        # exactly the k argmax picks read as -1 — so picked <=> masked < 0.
        # The (> eps) guard drops zero-metric picks (argmax exhausting a
        # row): a pick's value at pick time IS its metric, since earlier
        # picks only mask their own positions. No [B, M, A, k] one-hot
        # rebuild pass is ever built.
        sel = (masked_metric() < jnp.bfloat16(0)) & (metric > eps)
        mask_pos = sel & mask_in

    # --- conflict resolution: anchor claimed by multiple gts -> max IoU ---
    # One unconditional broadcast-compare replaces the r2/r3 three-pass form
    # (claimed-count sum + [B,A,M] one_hot + transpose + where): argmax over
    # the mask_pos-masked IoUs picks the highest-IoU claiming gt when >=2
    # claim, the single claimant when exactly 1 (its IoU >= 0 > -1), and is
    # irrelevant when 0 claim (mask_pos already false) — so
    # ``mask_pos & (row == best_gt)`` is bit-identical in every case.
    ious_masked = jnp.where(mask_pos, ious, -1.0)
    best_gt = jnp.argmax(ious_masked, axis=1)  # [B, A]
    row = jax.lax.broadcasted_iota(jnp.int32, mask_pos.shape, 1)  # gt index
    mask_pos = mask_pos & (row == best_gt[:, None, :])

    fg_mask = mask_pos.any(axis=1)  # [B, A]

    # --- gather targets via one-hot contraction (mask_pos has at most one
    # true per anchor after conflict resolution) ---
    sel_f = mask_pos.astype(gt_bboxes.dtype)  # [B, M, A]
    # HIGHEST precision: this contraction is a gather of exact values (box
    # coordinates / one-hot labels); the TPU default would round the f32
    # inputs to bf16 and corrupt training targets by pixels. Boxes and the
    # label one-hot ride ONE contraction (payload [B, M, 4+nc]) — sel_f is
    # the dominant operand (550 MB f32 at bs=128/max_gt=128) and two
    # separate einsums read it twice (r3 profile: 1.6 + 1.3 ms).
    # Measured dead end (r3): ``best_gt`` is the exact assigned index per
    # anchor, so a jnp.take_along_axis over M looks cheaper than this
    # contraction — but the TPU dynamic-gather lowering made the whole step
    # 4.5% SLOWER (122.5 -> 128.0 ms at n/bs=128/max_gt=128, bit-identical
    # outputs). The MXU contraction stays.
    payload = jnp.concatenate(
        [gt_bboxes, gt_cls_onehot.astype(gt_bboxes.dtype)], axis=-1
    )  # [B, M, 4+nc]
    packed = jnp.einsum(
        "bma,bmc->bac", sel_f, payload, precision=jax.lax.Precision.HIGHEST
    )  # [B, A, 4+nc]
    target_bboxes = packed[..., :4]
    label_onehot = packed[..., 4:]
    target_labels = jnp.argmax(label_onehot, axis=-1).astype(jnp.int32)  # [B, A]

    # --- TAL soft scores: one-hot * normalized metric ---
    # per-gt max metric and max iou over its positive anchors
    metric_pos = jnp.where(mask_pos, metric, 0.0)
    iou_pos = jnp.where(mask_pos, ious, 0.0)
    gt_max_metric = metric_pos.max(axis=2, keepdims=True)  # [B, M, 1]
    gt_max_iou = iou_pos.max(axis=2, keepdims=True)
    norm_metric = metric_pos * gt_max_iou / (gt_max_metric + eps)  # [B, M, A]
    anchor_score = norm_metric.max(axis=1)  # [B, A]

    target_scores = label_onehot * anchor_score[..., None]
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)

    return target_labels, target_bboxes, target_scores, fg_mask
