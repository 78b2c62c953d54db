"""Probe: alternative formulations of the pathological depthwise shape.

dw_probe.py found XLA's k7 depthwise at [128, 80, 80, 64] runs ~4.4 ms
(~1.2 TFLOP/s) while the same op at [128, 40, 40, 128] runs ~0.2 ms — one
bad emitter path accounts for >half the yolo-ms-xs forward. Variants:

  base      grouped conv as-is
  cpad      zero-pad channels to 128 (2x FLOPs, hopefully the good emitter)
  rows      decompose 7x7 into 7 shifted 1x7 row convs
  k5 / k9   neighbors for reference
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def main(b=128, h=80, c=64, k=7):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()

    def dw(x, w, kk):
        cc = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, w.reshape(kk, kk, 1, cc), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cc,
        )

    def base(x, w):
        return dw(x, w, k)

    def cpad(x, w):
        cc = x.shape[-1]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - cc)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 128 - cc)))
        return dw(xp, wp, k)[..., :cc]

    def rows(x, w):
        cc = x.shape[-1]
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        out = 0.0
        for dy in range(k):
            row_w = w[dy : dy + 1].reshape(1, k, 1, cc)
            out = out + jax.lax.conv_general_dilated(
                xp[:, dy : dy + h], row_w, (1, 1),
                [(0, 0), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=cc,
            )
        return out

    def timeit(pipe, x, w):
        @jax.jit
        def timed(x, w):
            def body(carry, i):
                y = pipe(x + i.astype(x.dtype) * 1e-3, w)
                return carry + y.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        _ = jax.device_get(timed(x, w))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(timed(x, w))
            ts.append((time.perf_counter() - t0) / K)
        return min(ts) * 1e3

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal((b, h, h, c)), jnp.bfloat16))
    w = jax.device_put(jnp.asarray(rng.standard_normal((k, k, c)), jnp.bfloat16))

    # equivalence check on CPU-sized slice first
    y0 = base(x[:2], w)
    for name, fn in [("cpad", cpad), ("rows", rows)]:
        y1 = fn(x[:2], w)
        err = float(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)).max())
        print(json.dumps({"variant": name, "max_err_vs_base": err}), flush=True)

    for name, fn in [("base", base), ("cpad", cpad), ("rows", rows)]:
        ms = timeit(fn, x, w)
        print(json.dumps({"shape": [b, h, h, c], "k": k, "variant": name, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
