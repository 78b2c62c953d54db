"""A/B probe: per-level neck kernels vs round-2's uniform k=7 neck.

dw_k7_probe.py established that the k7 depthwise at [B, 80, 80, 64] hits a
pathological XLA emitter path (~3.2 TFLOP/s vs 6-13 everywhere else) and
that no reformulation of the op itself wins. The model-side mitigation is
to align the neck to the backbone's HKS protocol — kernel size matched to
feature stride (5 @ s8, 7 @ s16, 9 @ s32) — which removes the slow shape
entirely.  This probe builds BOTH variants in one process (same-run
comparison, per the ±10-20% session drift rule) and times fwd at bs=128.

Usage: python benchmarks/neck_kernel_probe.py [version] [batch]
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def main(version="xs", batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.ms import YOLOMS
    from yolo_ms_tpu.models.registry import count_params, init_model
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 640, 640, 3)), jnp.bfloat16)
    )

    results = {}
    for name, kernels in [("k777", (7, 7, 7)), ("k579", (5, 7, 9))]:
        model = YOLOMS(version, dtype=jnp.bfloat16, neck_kernels=kernels)
        variables = init_model(model, jax.random.PRNGKey(0), (640, 640))

        @jax.jit
        def timed(v, images):
            def body(carry, i):
                raw = model.apply(  # noqa: B023
                    v, images + i.astype(images.dtype) * 1e-3, train=False
                )
                return carry + sum(m.astype(jnp.float32).sum() for m in raw), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        _ = jax.device_get(timed(variables, x))  # compile + warmup
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = jax.device_get(timed(variables, x))
            ts.append((time.perf_counter() - t0) / K)
        ms = min(ts) * 1e3
        results[name] = {
            "ms": round(ms, 3),
            "img_per_s": round(batch / (ms / 1e3), 1),
            "params": count_params(variables),
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    results["speedup"] = round(results["k777"]["ms"] / results["k579"]["ms"], 4)
    print(json.dumps({"version": version, "batch": batch, **results}))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "xs",
        int(sys.argv[2]) if len(sys.argv) > 2 else 128,
    )
