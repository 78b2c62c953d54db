"""Probe: lax.top_k (full variadic sort on TPU) vs lax.approx_max_k
(PartialReduce hardware op) for the serving pre-NMS selection.

profile_e2e r3: the [128,8400] f32 top_k lowers to a full stable sort —
0.97 ms, the single biggest tail op. approx_max_k with aggregate_to_topk
returns sorted (values, indices); recall_target tunes the bin count. This
probe measures both and checks exact-set agreement on random and
adversarial (many-ties) inputs.

Usage: python benchmarks/topk_probe.py [batch] [a] [k]
"""

from __future__ import annotations

import json
import sys
import time

K = 20


def main(batch=128, a=8400, k=256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal((batch, a)), jnp.float32))

    def timeit(fn):
        @jax.jit
        def timed(x):
            def body(carry, i):
                v, idx = fn(x + i.astype(x.dtype) * 1e-6)
                return carry + v.sum() + idx.sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        _ = jax.device_get(timed(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = jax.device_get(timed(x))
            ts.append((time.perf_counter() - t0) / K)
        return min(ts) * 1e3

    variants = {
        "top_k": lambda v: jax.lax.top_k(v, k),
        "approx_r0.95": lambda v: jax.lax.approx_max_k(v, k, recall_target=0.95),
        "approx_r0.99": lambda v: jax.lax.approx_max_k(v, k, recall_target=0.99),
        "approx_r1.0": lambda v: jax.lax.approx_max_k(v, k, recall_target=1.0),
    }
    res = {}
    for name, fn in variants.items():
        res[name] = {"ms": round(timeit(fn), 4)}
        print(name, res[name], file=sys.stderr)

    # exactness: same VALUE multiset as top_k (indices may tie-break
    # differently) on random + heavy-ties inputs
    exact = {}
    xt = np.round(rng.standard_normal((8, a)) * 3).astype(np.float32)  # ties
    for name, fn in variants.items():
        if name == "top_k":
            continue
        ok = True
        for arr in (np.asarray(x[:8]), xt):
            want, _ = jax.lax.top_k(jnp.asarray(arr), k)
            got, _ = jax.jit(fn)(jnp.asarray(arr))
            ok &= bool(
                np.array_equal(
                    np.sort(np.asarray(want), axis=-1),
                    np.sort(np.asarray(got), axis=-1),
                )
            )
        exact[name] = ok
        print(f"{name} exact-values: {ok}", file=sys.stderr)
    print(json.dumps({"batch": batch, "a": a, "k": k, "times": res, "exact": exact}))


if __name__ == "__main__":
    argv = sys.argv[1:]
    main(*(int(v) for v in argv))
