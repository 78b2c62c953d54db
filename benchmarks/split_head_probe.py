"""A/B probe: split-head serving tail vs concat-head (same-run, TPU).

The head's per-scale channel concat ([B,H,W,4*reg_max+nc]) is a pure HBM
copy the serving tail never needs once max/argmax and the DFL gather read
the box/cls conv outputs directly (profile_e2e r3: pad_maximum fusions +
relayout copies ~0.9 ms at bs=128). split_head=True removes it from the
traced graph; this probe quantifies the win on the BN-folded deploy graph.

Usage: python benchmarks/split_head_probe.py [arch] [batch]
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def main(arch="n", batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    nc = 80
    model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
    folded = fold_batchnorm(init_model(model, jax.random.PRNGKey(0), (640, 640)))

    def scan_over(pipeline):
        @jax.jit
        def timed(v, images):
            def body(carry, i):
                imgs = images + i.astype(images.dtype) * 1e-3
                return carry + pipeline(v, imgs), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return timed

    def e2e_concat(v, x):
        with deploy_mode():
            raw = model.apply(v, x, train=False)
        out = fused_postprocess(raw, nc)
        return out["scores"].sum() + out["boxes"].sum()

    def e2e_split(v, x):
        with deploy_mode():
            raw = model.apply(v, x, train=False, split_head=True)
        out = fused_postprocess(raw, nc)
        return out["scores"].sum() + out["boxes"].sum()

    def fwd(v, x):
        with deploy_mode():
            raw = model.apply(v, x, train=False)
        return sum(m.astype(jnp.float32).sum() for m in raw)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 640, 640, 3)), jnp.bfloat16)
    )
    res = {}
    for name, fn in [("fwd", fwd), ("e2e_concat", e2e_concat), ("e2e_split", e2e_split)]:
        timed = scan_over(fn)
        _ = jax.device_get(timed(folded, x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = jax.device_get(timed(folded, x))
            ts.append((time.perf_counter() - t0) / K)
        ms = min(ts) * 1e3
        res[name] = {"ms": round(ms, 3), "img_per_s": round(batch / ms * 1e3, 1)}
        print(f"{name}: {res[name]}", file=sys.stderr)
    print(json.dumps({"arch": arch, "batch": batch, **res}))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "n",
        int(sys.argv[2]) if len(sys.argv) > 2 else 128,
    )
