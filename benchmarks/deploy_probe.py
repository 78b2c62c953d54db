"""Probe: BN-folded deploy graph vs train-structure eval graph on TPU.

Measures forward and forward+fused-postprocess for both structures
(bench.py scan methodology).
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def timeit(fn, *args):
    import jax

    _ = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / K)
    return min(ts) * 1e3


def main(arch="n", batch=32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    nc = 80
    model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (640, 640))
    folded = fold_batchnorm(variables)

    def scan_over(pipeline):
        @jax.jit
        def timed(v, images):
            def body(carry, i):
                imgs = images + i.astype(images.dtype) * 1e-3
                return carry + pipeline(v, imgs), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return timed

    def fwd_train_struct(v, x):
        raw = model.apply(v, x, train=False)
        return sum(m.astype(jnp.float32).sum() for m in raw)

    def fwd_deploy(v, x):
        with deploy_mode():
            raw = model.apply(v, x, train=False)
        return sum(m.astype(jnp.float32).sum() for m in raw)

    def e2e_deploy(v, x):
        with deploy_mode():
            raw = model.apply(v, x, train=False)
        out = fused_postprocess(raw, nc)
        return out["scores"].sum() + out["boxes"].sum()

    def e2e_train_struct(v, x):
        raw = model.apply(v, x, train=False)
        out = fused_postprocess(raw, nc)
        return out["scores"].sum() + out["boxes"].sum()

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 640, 640, 3)), jnp.bfloat16)
    )
    for name, fn, v in [
        ("fwd_bn", fwd_train_struct, variables),
        ("fwd_deploy", fwd_deploy, folded),
        ("e2e_bn", e2e_train_struct, variables),
        ("e2e_deploy", e2e_deploy, folded),
    ]:
        ms = timeit(scan_over(fn), v, x)
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


if __name__ == "__main__":
    arch = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(arch, batch)
