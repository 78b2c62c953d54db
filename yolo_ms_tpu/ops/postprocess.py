"""Fused serving post-process: raw head maps -> final detections, one graph.

Reference semantics (tools/test.py:167-218): decode -> max-class score ->
confidence threshold -> per-class NMS -> top detections. The naive pipeline
(decode_predictions + batched_nms) casts every raw map to f32, materializes
the [B, A, 4+nc] f32 decode tensor and a full [B, A, nc] sigmoid — ~1.4 GB
of HBM traffic at bs=128/A=8400 that never reaches the output. This module
fuses the tail around three identities:

1. argmax/max over class logits == argmax/max over sigmoid scores
   (sigmoid is monotonic) -> the per-class sigmoid is never computed; only
   the [B, K] top logits are sigmoided. The confidence threshold is applied
   in logit domain (one static scalar compare over [B, A]).
2. The raw box logits of the K pre-NMS survivors are gathered with
   per-scale one-hot MXU contractions and only then DFL-decoded — the
   [B, A, 4*reg_max] cross-scale concat never materializes, and every
   row-gather (classes, boxes, outputs) runs at the adaptive prefix width
   inside the lax.cond branch, not at full K. (Probed alternatives that
   LOST on TPU: take_along_axis row gathers at width K — a serial
   VMEM-bound gather at ~1.5 GiB/s — and decoding all A anchors first.)
3. Anchor centers and strides are pure functions of the flattened anchor
   index (level offsets are static), so the survivors' anchors are computed
   arithmetically from top_idx — no gather at all.

Output contract identical to ops/nms.py:batched_nms: dict with 'boxes'
[B, max_det, 4] xyxy f32, 'scores', 'classes', 'valid'. Equivalence with the
unfused pipeline is asserted in tests/test_nms.py.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.models.decode import DEFAULT_STRIDES
from yolo_ms_tpu.nn.blocks import dfl_expectation
from yolo_ms_tpu.ops.nms import CLASS_OFFSET, nms_fixed
from yolo_ms_tpu.ops.pallas.select import select_scale, select_supported


@partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "reg_max",
        "strides",
        "conf_thresh",
        "iou_thresh",
        "pre_nms_topk",
        "max_det",
        "class_aware",
        "use_pallas",
        "prefix_widths",
    ),
)
def fused_postprocess(
    raw_maps: Sequence[jax.Array],
    num_classes: int,
    reg_max: int = 16,
    strides: tuple = DEFAULT_STRIDES,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    pre_nms_topk: int = 1024,
    max_det: int = 300,
    class_aware: bool = True,
    use_pallas: bool = False,
    prefix_widths: tuple = (256,),
):
    """Raw per-scale NHWC maps [B, H, W, 4*reg_max+nc] -> final detections.

    Each ``raw_maps`` entry may instead be a ``(box_map, cls_map)`` tuple
    (the head's ``split=True`` serving output, [B,H,W,4*reg_max] +
    [B,H,W,nc]): identical results, but the per-scale channel concat — a
    pure ~0.9 ms HBM copy at bs=128 that serving never needs — is never
    built (profile_e2e r3: pad_maximum fusions + relayout copies).
    """
    no = 4 * reg_max + num_classes
    split = isinstance(raw_maps[0], (tuple, list))
    b = (raw_maps[0][0] if split else raw_maps[0]).shape[0]
    shapes = [
        (m[0] if split else m).shape[1:3] for m in raw_maps
    ]

    # (1) per-scale class reduction BEFORE any concat: max/argmax over
    # class logits (sigmoid deferred to the K winners — monotonic). Only
    # per-anchor results and the box-logit slices are concatenated; the
    # [B, A, no] raw concat never exists and the [B, A, nc] class block is
    # reduced in place.
    #
    # use_pallas opts into the Pallas selection kernel
    # (ops/pallas/select.py). Measured on v5e at bs=128 it LOSES to this
    # XLA path (~10 ms vs ~4 ms for the selection stages: the pattern is
    # memory-bound multi-reductions, where XLA's fused elementwise engine
    # is already near the HBM floor and the kernel pays per-grid-step VPU
    # lane padding) — so the default is the XLA path on every backend.
    # (The kernel decodes ltrb for ALL anchors; its outputs are adapted to
    # the top-K-only decode below by a narrow gather.)
    # all-or-nothing: mixed pallas/XLA scales would split the box data
    # between the two decode paths below
    use_pallas = (
        use_pallas
        and not split
        and all(
            select_supported(m.shape[1] * m.shape[2], num_classes)
            for m in raw_maps
        )
    )
    # Per-anchor class ids are stored in the maps' dtype so the prefix-width
    # one-hot gather can share the DFL gather's selector: ids < 256
    # round-trip bf16 exactly (8 mantissa bits), anything wider uses f32.
    map_dt = (raw_maps[0][0] if split else raw_maps[0]).dtype
    cid_dt = map_dt if (num_classes <= 256 or map_dt == jnp.float32) else jnp.float32

    # When the id channel's dtype matches the maps', it is PACKED as a 65th
    # channel of the per-scale box operand so the prefix-width gather below
    # is ONE einsum per scale — the [B, kk, hw_s] one-hot selector (419 MB
    # bf16 at bs=128 for the s8 scale) is materialized and read once, not
    # twice (profile r3: broadcast_in_dim 0.52 ms/iter).
    packed_cid = cid_dt == map_dt

    max_l, cls_l, box_l, cid_l, ltrb_l = [], [], [], [], []
    for m in raw_maps:
        if split:
            box_m, cls_m_4d = m
            hw = box_m.shape[1] * box_m.shape[2]
            cls_m = cls_m_4d.reshape(b, hw, num_classes)
            mx = jnp.max(cls_m, axis=-1)
            box_s = box_m.reshape(b, hw, 4 * reg_max)
            cid_s = jnp.argmax(cls_m, axis=-1).astype(cid_dt)[..., None]
            if packed_cid:
                box_l.append(jnp.concatenate([box_s, cid_s], axis=-1))
            else:
                box_l.append(box_s)
                cid_l.append(cid_s)
            max_l.append(mx)
            continue
        hw = m.shape[1] * m.shape[2]
        flat_m = m.reshape(b, hw, no)
        if use_pallas:
            # compiled Mosaic on TPU; interpret elsewhere (CPU tests)
            mx, cid, ltrb_s = select_scale(
                flat_m,
                num_classes,
                reg_max,
                interpret=jax.default_backend() != "tpu",
            )
            mx = mx.astype(flat_m.dtype)  # top-k key dtype parity with XLA path
            ltrb_l.append(ltrb_s)
            cls_l.append(cid)
        else:
            cls_m = flat_m[..., 4 * reg_max :]
            mx = jnp.max(cls_m, axis=-1)
            # per-scale slice kept un-concatenated: the [B, A, 4*reg_max]
            # concat (137 MB bf16 at bs=128) measured 0.42 ms of pure copy;
            # the one-hot DFL gather below contracts per scale instead.
            box_s = flat_m[..., : 4 * reg_max]
            cid_s = jnp.argmax(cls_m, axis=-1).astype(cid_dt)[..., None]
            if packed_cid:
                box_l.append(jnp.concatenate([box_s, cid_s], axis=-1))
            else:
                box_l.append(box_s)
                cid_l.append(cid_s)
        max_l.append(mx)
    # Ranking keys stay in the maps' native dtype (bf16 for serving): the
    # selection sort is bandwidth-bound, and an f32 upcast would double its
    # HBM traffic. top-k VALUES are upcast to f32 after selection for the
    # sigmoid/gate, so scores are unchanged; only exact-tie ORDER among
    # anchors within one bf16 ulp can differ, and the stable sort keeps
    # that deterministic.
    max_logit = jnp.concatenate(max_l, axis=1)  # [B, A]
    cls_id = jnp.concatenate(cls_l, axis=1) if cls_l else None  # [B, A] (pallas)
    a = max_logit.shape[1]
    k = min(pre_nms_topk, a)

    ltrb_all = (
        jnp.concatenate(ltrb_l, axis=1) if ltrb_l else None
    )  # [B, A, 4] f32 (pallas path)

    level_sizes = [h * w for h, w in shapes]
    offs = np.cumsum([0] + level_sizes)

    # Static logit-domain confidence threshold: sigmoid(l) > c  <=>
    # l > log(c/(1-c)) (sigmoid is monotonic), so the branch predicate
    # below never needs a top-k or a sigmoid over all A anchors.
    if conf_thresh >= 1.0:
        logit_thresh = np.inf
    elif conf_thresh <= 0.0:
        logit_thresh = -np.inf
    else:
        logit_thresh = float(np.log(conf_thresh / (1.0 - conf_thresh)))

    def _tail(kk: int):
        """Decode + NMS + final selection at candidate width kk.

        Everything downstream of the conf gate only ever touches the
        gate's survivors, which are a PREFIX of the score-sorted K (the
        gate is monotonic in the sort key) — so the WHOLE tail runs at
        prefix width inside the cond branch: the top-k selection itself
        (approx_max_k at recall 1.0 is value-exact, so the gate passes
        the same anchor set at either width; only the relative order of
        anchors whose keys tie EXACTLY may differ between widths), the
        class-row gather + argmax, the DFL one-hot gather [B, kk, hw_s],
        the suppression matrix [kk, kk], and the final top-k over kk.
        Round-2 profiling showed the pre-cond versions of these at
        K=1024 were ~2.4 ms of the ~5 ms tail (the [B, A] class-id
        take_along_axis alone was 1.33 ms — a serial VMEM-bound gather
        at 1.5 GiB/s). Outputs are padded to max_det so both cond
        branches agree.
        """

        def fn(_):
            # approx_max_k lowers to the TPU PartialReduce op instead of a
            # full [B, A] variadic sort (the sort was 0.97 ms at bs=128,
            # profile r3); recall_target=1.0 + aggregate_to_topk keeps it
            # EXACT (verified value-exact incl. heavy ties,
            # benchmarks/topk_probe.py) and sorted descending. Non-TPU
            # backends decompose it to the exact dense fallback.
            top_logit, idx = jax.lax.approx_max_k(max_logit, kk, recall_target=1.0)
            # confidence gate (reference uses strict >, tools/test.py:182)
            scores = jax.nn.sigmoid(top_logit.astype(jnp.float32))
            scores = jnp.where(scores > conf_thresh, scores, -1.0)

            # DFL box logits AND class ids for the kk survivors only: both
            # gathered with per-scale one-hot MXU contractions sharing one
            # selector (exact: one-hot x bf16 values, f32 accumulate) —
            # measured ~1 ms faster at bs=128 than decoding all A anchors
            # and narrow-gathering, and far faster than take_along_axis row
            # gathers. Out-of-level indices one-hot to the zero row, so
            # summing the per-scale partials reassembles the full gather
            # without ever materializing any cross-scale concat. The class
            # id rides along as ONE extra channel (the per-scale argmax
            # stored in the maps' dtype — exact for ids < 256): gathering
            # the precomputed id costs a [B,hw,1] operand instead of the
            # [B,hw,nc] class-row relayout the r3 profile flagged (~0.9 ms
            # of data-formatting copies at bs=128).
            if box_l:
                top_box, top_cid = None, None
                for s, box_s in enumerate(box_l):
                    local = idx - int(offs[s])
                    in_lvl = (idx >= int(offs[s])) & (idx < int(offs[s + 1]))
                    sel = jax.nn.one_hot(
                        jnp.where(in_lvl, local, -1),
                        level_sizes[s],
                        dtype=box_s.dtype,
                    )
                    # for f32 maps HIGHEST stops the TPU default from
                    # rounding the gathered logits to bf16 (bf16 maps are
                    # exact as-is)
                    prec = (
                        jax.lax.Precision.HIGHEST
                        if box_s.dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT
                    )
                    part = jnp.einsum(
                        "bka,bad->bkd",
                        sel,
                        box_s,
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    )
                    top_box = part if top_box is None else top_box + part
                    if not packed_cid:
                        part_c = jnp.einsum(
                            "bka,bad->bkd",
                            sel.astype(cid_l[s].dtype),
                            cid_l[s],
                            precision=(
                                jax.lax.Precision.HIGHEST
                                if cid_l[s].dtype == jnp.float32
                                else jax.lax.Precision.DEFAULT
                            ),
                            preferred_element_type=jnp.float32,
                        )
                        top_cid = part_c if top_cid is None else top_cid + part_c
                if packed_cid:
                    top_box, top_cid = top_box[..., :-1], top_box[..., -1:]
                ltrb = dfl_expectation(top_box.reshape(b, kk, 4, reg_max))
                classes = jnp.round(top_cid[..., 0]).astype(jnp.int32)
            else:
                ltrb = jnp.take_along_axis(ltrb_all, idx[..., None], axis=1)
                classes = jnp.take_along_axis(cls_id, idx, axis=1)

            # anchors/strides computed arithmetically from the flat index —
            # level boundaries are static, so no table gather is needed
            lvl = sum(
                (idx >= int(offs[i])).astype(jnp.int32)
                for i in range(1, len(shapes))
            )
            width_t = jnp.asarray([w for _, w in shapes], jnp.int32)[lvl]
            base_t = jnp.asarray(offs[:-1], jnp.int32)[lvl]
            stride_k = jnp.asarray(strides, jnp.float32)[lvl][..., None]
            local = idx - base_t
            ax = (local % width_t).astype(jnp.float32) + 0.5
            ay = (local // width_t).astype(jnp.float32) + 0.5
            anchors_k = jnp.stack([ax, ay], axis=-1)  # [B, kk, 2] grid

            # f32 anchor decode (yolov8_head.py:138-143 semantics)
            x1y1 = (anchors_k - ltrb[..., :2]) * stride_k
            x2y2 = (anchors_k + ltrb[..., 2:]) * stride_k
            boxes = jnp.concatenate([x1y1, x2y2], axis=-1)  # xyxy px

            # class-aware NMS via the class-offset trick + greedy fixed point
            if class_aware and num_classes > 1:
                shifted = boxes + (
                    classes[..., None].astype(boxes.dtype) * CLASS_OFFSET
                )
            else:
                shifted = boxes
            keep = jax.vmap(nms_fixed, in_axes=(0, 0, None))(
                shifted, scores, iou_thresh
            )
            kept = jnp.where(keep, scores, -1.0)

            # final top max_det; the row gather runs as one packed one-hot
            # MXU contraction (boxes + class id as a 5th f32 channel — ids
            # < 2^24 round-trip exactly; HIGHEST precision so nothing is
            # rounded to bf16), replacing two serial take_along_axis ops
            kd = min(max_det, kk)
            out_scores, out_idx = jax.lax.top_k(kept, kd)
            packed = jnp.concatenate(
                [boxes, classes[..., None].astype(jnp.float32)], axis=-1
            )
            sel_out = jax.nn.one_hot(out_idx, kk, dtype=jnp.float32)
            out = jnp.einsum(
                "bok,bkd->bod",
                sel_out,
                packed,
                precision=jax.lax.Precision.HIGHEST,
            )
            valid = out_scores > 0.0
            # canonicalize invalid slots: zero boxes/ids, 0.0 scores —
            # otherwise they carry whichever candidate the final top_k
            # happened to rank there, which differs between prefix widths
            # and makes outputs non-deterministic across serving configs
            out = out * valid[..., None].astype(out.dtype)
            out_scores = jnp.maximum(out_scores, 0.0)
            out_boxes = out[..., :4]
            out_classes = jnp.round(out[..., 4]).astype(jnp.int32)
            if kd < max_det:
                pad = max_det - kd
                out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
                out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)))
                out_classes = jnp.pad(out_classes, ((0, 0), (0, pad)))
                valid = jnp.pad(valid, ((0, 0), (0, pad)))
            return {
                "boxes": out_boxes,
                "scores": out_scores,
                "classes": out_classes.astype(jnp.int32),
                "valid": valid,
            }

        return fn

    # Adaptive prefix dispatch (EXACT, not approximate): when every image's
    # conf survivors fit in a small prefix — the typical serving case at
    # conf 0.25 — the entire tail INCLUDING the top-k sort, class gather
    # and DFL gather runs at that width; wider tiers (and finally the
    # dense width-K tail) are the outer lax.cond branches. The predicate
    # is a plain threshold count over [B, A] (no sort). The count
    # threshold is nudged down by a conservative margin (> one bf16 ulp at
    # |thresh|; the keys may be bf16 and the compare promotes the
    # threshold into the key dtype) so any float disagreement with the f32
    # sigmoid gate can only OVERcount — i.e. fall back to a wider branch,
    # never wrongly take a prefix.
    widths = [w for w in sorted(set(prefix_widths)) if 0 < w < k]
    if widths:
        if np.isfinite(logit_thresh):
            count_thresh = logit_thresh - 0.02 * max(1.0, abs(logit_thresh))
        else:
            count_thresh = logit_thresh
        n_valid = (max_logit > count_thresh).sum(axis=-1).max()
        tail_fn = _tail(k)
        for w in reversed(widths):

            def tier(_, w=w, wider=tail_fn):
                return jax.lax.cond(n_valid <= w, _tail(w), wider, 0)

            tail_fn = tier
        return tail_fn(0)
    return _tail(k)(0)
