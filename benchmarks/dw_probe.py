"""Probe: depthwise conv shapes in the MS family + per-shape XLA cost.

1. Collects every stride-1 depthwise invocation (shape, kernel size) from a
   yolo-ms forward trace by monkeypatching _DepthwiseConv.
2. Times each shape with XLA's grouped conv (bench.py scan methodology).
   Historical: the round-1 Pallas depthwise kernel measured 2-6x slower at
   every site (see PERF.md) and was removed.
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def collect_shapes(arch: str, batch: int):
    import jax
    import jax.numpy as jnp

    from yolo_ms_tpu.models.registry import build_model
    from yolo_ms_tpu.nn import blocks

    shapes = []
    orig = blocks._DepthwiseConv.__call__

    def spy(self, x):
        shapes.append((tuple(x.shape), int(self.kernel_size)))
        return orig(self, x)

    blocks._DepthwiseConv.__call__ = spy
    try:
        model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
        x = jnp.zeros((batch, 640, 640, 3), jnp.bfloat16)
        jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False),
            jax.eval_shape(model.init, jax.random.PRNGKey(0), x),
            x,
        )
    finally:
        blocks._DepthwiseConv.__call__ = orig
    return shapes


def time_fn(fn, *args):
    import jax

    _ = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / K)
    return min(ts) * 1e3


def main(arch="yolo-ms-xs", batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    def _dw_xla(x, w):
        c = x.shape[-1]
        kk = w.shape[0]
        return jax.lax.conv_general_dilated(
            x, w.reshape(kk, kk, 1, c), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    enable_compilation_cache()
    shapes = collect_shapes(arch, batch)
    uniq = {}
    for s, k in shapes:
        uniq[(s, k)] = uniq.get((s, k), 0) + 1
    print(json.dumps({"arch": arch, "dw_sites": [[list(s), k, n] for (s, k), n in uniq.items()]}))

    rng = np.random.default_rng(0)

    def scan_over(pipe, x, w):
        @jax.jit
        def timed(x, w):
            def body(carry, i):
                return carry + pipe(x + i.astype(x.dtype) * 1e-3, w).astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return timed, (x, w)

    for (s, k), n in sorted(uniq.items(), key=lambda it: -np.prod(it[0][0][0])):
        b, h, w_, c = s
        x = jax.device_put(jnp.asarray(rng.standard_normal(s), jnp.bfloat16))
        wt = jax.device_put(jnp.asarray(rng.standard_normal((k, k, c)), jnp.bfloat16))
        f, a = scan_over(_dw_xla, x, wt)
        t_xla = time_fn(f, *a)
        row = {
            "shape": list(s),
            "k": k,
            "count": n,
            "xla_ms": round(t_xla, 3),
            "gflop": round(2 * b * h * w_ * c * k * k / 1e9, 2),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    arch = sys.argv[1] if len(sys.argv) > 1 else "yolo-ms-xs"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    main(arch, batch)
