"""Probe A: locate the k7 depthwise emitter cliff (dw_probe found
[128,80,80,64] ~8x less efficient than [128,40,40,128]).
Probe B: stem conv (3->16 k3 s2 @640) vs its space-to-depth rewrite
(12->16 k2 s1 @320, exact weight transform exists).
"""

from __future__ import annotations

import json
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def scan_over(pipe):
        @jax.jit
        def timed(*a):
            def body(c, i):
                varied = (a[0] + i.astype(a[0].dtype) * 1e-3,) + a[1:]
                return c + pipe(*varied).astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return timed

    def dw(x, w):
        c, k = x.shape[-1], w.shape[0]
        return jax.lax.conv_general_dilated(
            x, w.reshape(k, k, 1, c), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    # ---- A: k7 depthwise shape grid (constant total work where possible)
    for b, h, w_, c in [
        (128, 80, 80, 64),
        (128, 80, 80, 128),
        (128, 40, 40, 64),
        (128, 40, 40, 128),
        (128, 40, 80, 64),
        (128, 80, 40, 64),
        (256, 40, 80, 64),
        (512, 40, 40, 64),
    ]:
        x = jax.device_put(jnp.asarray(rng.standard_normal((b, h, w_, c)), jnp.bfloat16))
        wt = jax.device_put(jnp.asarray(rng.standard_normal((7, 7, c)), jnp.bfloat16))
        ms = timeit(scan_over(dw), x, wt)
        gf = 2 * b * h * w_ * c * 49 / 1e9
        print(json.dumps({"probe": "k7", "shape": [b, h, w_, c], "ms": round(ms, 2), "gflop": round(gf, 1)}), flush=True)

    # ---- B: stem conv vs space-to-depth rewrite
    bs = 32
    x = jax.device_put(jnp.asarray(rng.standard_normal((bs, 640, 640, 3)), jnp.bfloat16))
    w3 = jax.device_put(jnp.asarray(rng.standard_normal((3, 3, 3, 16)), jnp.bfloat16))

    def stem(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def stem_s2d(x, w):
        # pad 1 on top/left so every k3s2 window is covered by a 2x2 window
        # of 2x2 phase cells; then conv k2 s1 over 12 channels.
        # weight transform: w2[dy2, dx2, 4*cin-phase, cout] from w3 taps.
        b = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # 642
        s2d = xp.reshape(b, 321, 2, 321, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        s2d = s2d.reshape(b, 321, 321, 12)  # phase layout (a, b, cin)
        # build w2 from w3: output pixel (i,j) = input window rows 2i-1..2i+1
        # = padded rows 2i..2i+2 = cells (i, i+1) phases (0,1),(0)
        w2 = jnp.zeros((2, 2, 12, 16), w.dtype)
        for dy in range(3):
            for dx in range(3):
                cy, py = divmod(dy, 2)
                cx, px = divmod(dx, 2)
                w2 = w2.at[cy, cx, (py * 2 + px) * 3 : (py * 2 + px) * 3 + 3, :].set(
                    w[dy, dx]
                )
        return jax.lax.conv_general_dilated(
            s2d, w2, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # correctness first
    y0 = stem(x[:2], w3)
    y1 = stem_s2d(x[:2], w3)
    err = float(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)).max())
    print(json.dumps({"probe": "stem_equiv", "max_err": err, "shapes": [list(y0.shape), list(y1.shape)]}), flush=True)

    for name, fn in [("stem", stem), ("stem_s2d", stem_s2d)]:
        ms = timeit(scan_over(fn), x, w3)
        print(json.dumps({"probe": name, "bs": bs, "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
