"""Probe: post-process TAIL only, sub-stage breakdown on synthetic raw maps.

Feeds random [B, H, W, 84] bf16 maps (no model forward) so each selection
sub-stage's cost is visible directly. Methodology: K iterations inside one
on-device lax.scan with per-iteration input variation (bench.py rules).
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def timeit(fn, *args):
    import jax

    _ = jax.device_get(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(fn(*args))
        times.append((time.perf_counter() - t0) / K)
    return min(times) * 1e3


def main(batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.decode import decode_predictions
    from yolo_ms_tpu.ops.nms import batched_nms
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    nc, reg_max, topk = 80, 16, 1024
    no = 4 * reg_max + nc
    shapes = [(80, 80), (40, 40), (20, 20)]

    rng = np.random.default_rng(0)
    maps = [
        jax.device_put(
            jnp.asarray(rng.standard_normal((batch, h, w, no)), jnp.bfloat16)
        )
        for h, w in shapes
    ]

    def scan_over(pipeline):
        @jax.jit
        def timed(*maps):
            def body(carry, i):
                varied = [m + i.astype(m.dtype) * 1e-3 for m in maps]
                return carry + pipeline(varied), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return timed

    def flat_parts(raw):
        b = raw[0].shape[0]
        flat = jnp.concatenate([m.reshape(b, -1, no) for m in raw], axis=1)
        return flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]

    def s_flatten(raw):
        box_logits, cls_logits = flat_parts(raw)
        return box_logits.astype(jnp.float32).sum() + cls_logits.astype(
            jnp.float32
        ).sum()

    def s_maxarg(raw):
        _, cls_logits = flat_parts(raw)
        max_logit = jnp.max(cls_logits, axis=-1)
        cls_id = jnp.argmax(cls_logits, axis=-1)
        return max_logit.astype(jnp.float32).sum() + cls_id.sum().astype(
            jnp.float32
        )

    def s_max_only(raw):
        _, cls_logits = flat_parts(raw)
        return jnp.max(cls_logits, axis=-1).astype(jnp.float32).sum()

    def s_dfl(raw):
        from yolo_ms_tpu.nn.blocks import dfl_expectation

        box_logits, _ = flat_parts(raw)
        b, a = box_logits.shape[:2]
        return dfl_expectation(box_logits.reshape(b, a, 4, reg_max)).sum()

    def dfl_matmul(box_logits, precision):
        b, a = box_logits.shape[:2]
        x = box_logits.astype(jnp.float32)
        c = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(jnp.maximum(x - c, -60.0))
        idx = jnp.arange(4 * reg_max)
        seg = (idx[:, None] // reg_max == jnp.arange(4)[None, :]).astype(
            jnp.float32
        )
        rhs = jnp.concatenate([seg * (idx % reg_max)[:, None], seg], axis=1)
        out = jnp.einsum("...i,ij->...j", e, rhs, precision=precision)
        return out[..., :4] / out[..., 4:]

    def s_dfl_default(raw):
        box_logits, _ = flat_parts(raw)
        return dfl_matmul(box_logits, jax.lax.Precision.DEFAULT).sum()

    def s_dfl_high(raw):
        box_logits, _ = flat_parts(raw)
        return dfl_matmul(box_logits, jax.lax.Precision.HIGH).sum()

    def s_perscale(raw):
        """Per-scale max/argmax/DFL, concat only tiny outputs (no big concat)."""
        from yolo_ms_tpu.nn.blocks import dfl_expectation

        b = raw[0].shape[0]
        max_l, cls_l, ltrb_l = [], [], []
        for m in raw:
            hw = m.shape[1] * m.shape[2]
            fm = m.reshape(b, hw, no)
            cls_m = fm[..., 4 * reg_max :]
            max_l.append(jnp.max(cls_m, axis=-1))
            cls_l.append(jnp.argmax(cls_m, axis=-1).astype(jnp.int32))
            ltrb_l.append(
                dfl_expectation(fm[..., : 4 * reg_max].reshape(b, hw, 4, reg_max))
            )
        max_logit = jnp.concatenate(max_l, axis=1)
        cls_id = jnp.concatenate(cls_l, axis=1)
        ltrb_all = jnp.concatenate(ltrb_l, axis=1)
        tl, ti = jax.lax.top_k(max_logit.astype(jnp.float32), topk)
        ltrb = jnp.take_along_axis(ltrb_all, ti[..., None], axis=1)
        cls_k = jnp.take_along_axis(cls_id, ti, axis=1)
        return ltrb.sum() + tl.sum() + cls_k.astype(jnp.float32).sum()

    def s_dfl_naive(raw):
        box_logits, _ = flat_parts(raw)
        b, a = box_logits.shape[:2]
        dist = box_logits.astype(jnp.float32).reshape(b, a, 4, reg_max)
        p = jax.nn.softmax(dist, axis=-1)
        bins = jnp.arange(reg_max, dtype=jnp.float32)
        return jnp.einsum("bacr,r->bac", p, bins).sum()

    def s_topk(raw):
        _, cls_logits = flat_parts(raw)
        max_logit = jnp.max(cls_logits, axis=-1)
        tl, ti = jax.lax.top_k(max_logit.astype(jnp.float32), topk)
        return tl.sum() + ti.sum().astype(jnp.float32)

    def s_approx_topk(raw):
        _, cls_logits = flat_parts(raw)
        max_logit = jnp.max(cls_logits, axis=-1)
        tl, ti = jax.lax.approx_max_k(
            max_logit.astype(jnp.float32), topk, recall_target=0.95
        )
        return tl.sum() + ti.sum().astype(jnp.float32)

    def s_gather(raw):
        box_logits, cls_logits = flat_parts(raw)
        b, a = box_logits.shape[:2]
        max_logit = jnp.max(cls_logits, axis=-1)
        cls_id = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        dist = box_logits.astype(jnp.float32).reshape(b, a, 4, reg_max)
        p = jax.nn.softmax(dist, axis=-1)
        bins = jnp.arange(reg_max, dtype=jnp.float32)
        ltrb_all = jnp.einsum("bacr,r->bac", p, bins)
        tl, ti = jax.lax.top_k(max_logit.astype(jnp.float32), topk)
        ltrb = jnp.take_along_axis(ltrb_all, ti[..., None], axis=1)
        cls_k = jnp.take_along_axis(cls_id, ti, axis=1)
        return ltrb.sum() + tl.sum() + cls_k.astype(jnp.float32).sum()

    def s_gather_onehot(raw):
        from yolo_ms_tpu.nn.blocks import dfl_expectation

        box_logits, cls_logits = flat_parts(raw)
        b, a = box_logits.shape[:2]
        max_logit = jnp.max(cls_logits, axis=-1)
        cls_id = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        ltrb_all = dfl_expectation(box_logits.reshape(b, a, 4, reg_max))
        tl, ti = jax.lax.top_k(max_logit.astype(jnp.float32), topk)
        data = jnp.concatenate(
            [ltrb_all, cls_id[..., None].astype(jnp.float32)], axis=-1
        )  # [B, A, 5]
        sel = jax.nn.one_hot(ti, a, dtype=jnp.float32)  # [B, K, A]
        top = jnp.einsum(
            "bka,bad->bkd", sel, data, precision=jax.lax.Precision.HIGHEST
        )
        return top.sum() + tl.sum()

    def s_pallas_sel(raw):
        from yolo_ms_tpu.ops.pallas.select import select_scale

        b = raw[0].shape[0]
        acc = jnp.zeros(())
        for m in raw:
            hw = m.shape[1] * m.shape[2]
            mx, cid, ltrb = select_scale(m.reshape(b, hw, no), nc, reg_max)
            acc = acc + mx.sum() + cid.sum().astype(jnp.float32) + ltrb.sum()
        return acc

    def s_fused(raw):
        out = fused_postprocess(raw, nc)
        return out["scores"].sum() + out["boxes"].sum()

    def s_fused_prefix(raw):
        """fused + adaptive prefix NMS: valid candidates are a prefix of the
        score-sorted top-k (conf gate is monotonic), so when every image has
        <= KS survivors the NMS runs on a [KS, KS] matrix via lax.cond."""
        from yolo_ms_tpu.nn.blocks import dfl_expectation
        from yolo_ms_tpu.ops.nms import CLASS_OFFSET, nms_fixed

        ks = 256
        b = raw[0].shape[0]
        max_l, cls_l, ltrb_l = [], [], []
        for m in raw:
            hw = m.shape[1] * m.shape[2]
            fm = m.reshape(b, hw, no)
            cls_m = fm[..., 4 * reg_max :]
            max_l.append(jnp.max(cls_m, axis=-1))
            cls_l.append(jnp.argmax(cls_m, axis=-1).astype(jnp.int32))
            ltrb_l.append(
                dfl_expectation(fm[..., : 4 * reg_max].reshape(b, hw, 4, reg_max))
            )
        max_logit = jnp.concatenate(max_l, axis=1)
        cls_id = jnp.concatenate(cls_l, axis=1)
        ltrb_all = jnp.concatenate(ltrb_l, axis=1)
        tl, ti = jax.lax.top_k(max_logit.astype(jnp.float32), topk)
        ltrb = jnp.take_along_axis(ltrb_all, ti[..., None], axis=1)
        cls_k = jnp.take_along_axis(cls_id, ti, axis=1)
        boxes = jnp.concatenate([ltrb * 8.0, ltrb * 8.0 + 64.0], -1)  # fake decode
        scores = jax.nn.sigmoid(tl)
        scores = jnp.where(scores > 0.25, scores, -1.0)
        shifted = boxes + cls_k[..., None].astype(boxes.dtype) * CLASS_OFFSET
        n_valid = (scores > 0.0).sum(-1).max()

        def small(args):
            sh, sc = args
            keep = jax.vmap(nms_fixed, in_axes=(0, 0, None))(
                sh[:, :ks], sc[:, :ks], 0.45
            )
            return jnp.pad(keep, ((0, 0), (0, topk - ks)))

        def full(args):
            sh, sc = args
            return jax.vmap(nms_fixed, in_axes=(0, 0, None))(sh, sc, 0.45)

        keep = jax.lax.cond(n_valid <= ks, small, full, (shifted, scores))
        kept = jnp.where(keep, scores, -1.0)
        out_s, out_i = jax.lax.top_k(kept, 300)
        return out_s.sum() + out_i.sum().astype(jnp.float32)

    def s_dfl_widegather(raw):
        """one-hot MXU gather of raw [B,K,64] box logits, DFL on K only."""
        b = raw[0].shape[0]
        max_l, box_l = [], []
        for m in raw:
            hw = m.shape[1] * m.shape[2]
            fm = m.reshape(b, hw, no)
            max_l.append(jnp.max(fm[..., 4 * reg_max :], axis=-1))
            box_l.append(fm[..., : 4 * reg_max])
        max_logit = jnp.concatenate(max_l, axis=1)
        box_logits = jnp.concatenate(box_l, axis=1)  # [B, A, 64] bf16
        a = max_logit.shape[1]
        tl, ti = jax.lax.top_k(max_logit.astype(jnp.float32), topk)
        sel = jax.nn.one_hot(ti, a, dtype=box_logits.dtype)  # [B, K, A]
        top_box = jnp.einsum(
            "bka,bad->bkd", sel, box_logits, preferred_element_type=jnp.float32
        )  # exact: one-hot x bf16 values
        from yolo_ms_tpu.nn.blocks import dfl_expectation

        ltrb = dfl_expectation(top_box.reshape(b, topk, 4, reg_max))
        return ltrb.sum() + tl.sum()

    def s_old(raw):
        preds = decode_predictions(raw, nc)
        out = batched_nms(preds.astype(jnp.float32))
        return out["scores"].sum() + out["boxes"].sum()

    stages = [
        ("flatten+max", s_max_only),
        ("sel_perscale", s_perscale),
        ("dfl_widegather", s_dfl_widegather),
        ("fused_full", s_fused),
        ("fused_prefixnms", s_fused_prefix),
    ]
    if "--all" in sys.argv:
        stages += [
            ("flatten", s_flatten),
            ("flatten+max+argmax", s_maxarg),
            ("flatten+dfl", s_dfl),
            ("flatten+dfl_naive", s_dfl_naive),
            ("flatten+dfl_default", s_dfl_default),
            ("flatten+dfl_high", s_dfl_high),
            ("flatten+max+topk", s_topk),
            ("sel_full", s_gather),
            ("sel_full_onehot", s_gather_onehot),
            ("old_full", s_old),
        ]
    for name, fn in stages:
        ms = timeit(scan_over(fn), *maps)
        print(
            json.dumps(
                {"batch": batch, "stage": name, "ms_per_batch": round(ms, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
