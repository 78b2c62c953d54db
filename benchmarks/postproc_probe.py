"""Probe: post-process cost on the real chip — fwd vs fwd+old vs fwd+fused.

Methodology identical to bench.py: K iterations inside one on-device
lax.scan with per-iteration input variation; a scalar reduced from every
iteration is fetched at the end (the only reliable sync over the tunnel).
"""

from __future__ import annotations

import json
import time

K = 10


def timeit(fn, *args):
    import jax

    _ = jax.device_get(fn(*args))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(fn(*args))
        times.append((time.perf_counter() - t0) / K)
    return min(times) * 1e3  # ms per iteration


def main(arch="n", batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.decode import decode_predictions
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.nms import batched_nms
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    nc = 80
    model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (640, 640))

    def scan_over(pipeline):
        @jax.jit
        def timed(v, images):
            def body(carry, i):
                imgs = images + i.astype(images.dtype) * 1e-3
                return carry + pipeline(v, imgs), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return timed

    def fwd_only(v, x):
        raw = model.apply(v, x, train=False)
        return sum(m.astype(jnp.float32).sum() for m in raw)

    def fwd_old(v, x):
        raw = model.apply(v, x, train=False)
        preds = decode_predictions(raw, nc)
        out = batched_nms(preds.astype(jnp.float32))
        return out["scores"].sum() + out["boxes"].sum()

    def fwd_fused(v, x):
        raw = model.apply(v, x, train=False)
        out = fused_postprocess(raw, nc)
        return out["scores"].sum() + out["boxes"].sum()

    def fwd_fused512(v, x):
        raw = model.apply(v, x, train=False)
        out = fused_postprocess(raw, nc, pre_nms_topk=512)
        return out["scores"].sum() + out["boxes"].sum()

    def fwd_fused_xla(v, x):
        raw = model.apply(v, x, train=False)
        out = fused_postprocess(raw, nc, use_pallas=False)
        return out["scores"].sum() + out["boxes"].sum()

    def fwd_sel(v, x):
        """Everything in the fused path up to (not including) NMS: flatten,
        max/argmax, full-A DFL expectation, top-k, gathers, box decode."""
        raw = model.apply(v, x, train=False)
        reg_max, k = 16, 1024
        no = 4 * reg_max + nc
        b = raw[0].shape[0]
        flat = jnp.concatenate([m.reshape(b, -1, no) for m in raw], axis=1)
        a = flat.shape[1]
        box_logits = flat[..., : 4 * reg_max]
        cls_logits = flat[..., 4 * reg_max :]
        max_logit = jnp.max(cls_logits, axis=-1)
        cls_id = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        dist = box_logits.astype(jnp.float32).reshape(b, a, 4, reg_max)
        p = jax.nn.softmax(dist, axis=-1)
        bins = jnp.arange(reg_max, dtype=jnp.float32)
        ltrb_all = jnp.einsum("bacr,r->bac", p, bins)
        top_logit, top_idx = jax.lax.top_k(max_logit.astype(jnp.float32), k)
        ltrb = jnp.take_along_axis(ltrb_all, top_idx[..., None], axis=1)
        top_classes = jnp.take_along_axis(cls_id, top_idx, axis=1)
        return (
            ltrb.sum()
            + top_logit.sum()
            + top_classes.astype(jnp.float32).sum()
        )

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 640, 640, 3)), jnp.bfloat16)
    )

    results = {}
    for name, fn in [
        ("fwd", fwd_only),
        ("fwd+old", fwd_old),
        ("fwd+fused_xla", fwd_fused_xla),
        ("fwd+fused", fwd_fused),
        ("fwd+fused512", fwd_fused512),
    ]:
        ms = timeit(scan_over(fn), variables, images)
        results[name] = round(ms, 2)
        print(
            json.dumps(
                {
                    "arch": arch,
                    "batch": batch,
                    "stage": name,
                    "ms_per_batch": round(ms, 2),
                    "img_per_s": round(batch / ms * 1e3, 1),
                }
            ),
            flush=True,
        )
    return results


if __name__ == "__main__":
    import sys

    arch = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    main(arch, batch)
