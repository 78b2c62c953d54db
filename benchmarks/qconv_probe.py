"""Probe: realistic W8A8 ConvSiLU layer vs the bf16 deploy layer.

int8_probe.py showed the raw int8 conv at 1.2-2.1x over bf16 on the hot
dense shapes — but with int8 activations ALREADY in HBM. A real W8A8
serving graph pays either (a) a dynamic per-tensor quantize of a bf16
input (absmax reduce + round/clip, one extra read + int8 write), or
(b) nothing extra when the whole graph is chained int8 (each layer's
requantize replaces its bf16 output write with an int8 one — LESS HBM
traffic). This probe measures the full layer in three forms at the hot
v8-n/MS deploy shapes:

  bf16      : conv(bf16) + bias + silu -> bf16 (the shipped deploy layer)
  w8a8_dyn  : absmax -> quant -> conv int8/int32 -> dequant+bias+silu -> bf16
  w8a8_chain: int8 in (static scale) -> conv -> dequant+bias+silu ->
              requant -> int8 out (static output scale)

Methodology: marginal rate between K and 5K scan iterations (per-dispatch
cost cancels), per-iteration input mutation, min of 3 reps.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/qconv_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def marginal_ms(fn, args, K=10, reps=3):
    def make(k):
        @jax.jit
        def loop(*a):
            def body(c, i):
                return c + fn(i, *a), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc

        return loop

    lo_f, hi_f = make(K), make(5 * K)
    _ = jax.device_get(lo_f(*args))
    _ = jax.device_get(hi_f(*args))
    lo, hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(lo_f(*args))
        lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = jax.device_get(hi_f(*args))
        hi.append(time.perf_counter() - t0)
    return (min(hi) - min(lo)) / (4 * K) * 1e3


def _conv(x, w, stride, acc=None):
    return jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **({"preferred_element_type": acc} if acc else {}),
    )


def case(name, x_shape, k, cout, stride):
    rng = np.random.default_rng(0)
    cin = x_shape[-1]
    xf = jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout), dtype=np.int8))
    # per-output-channel weight dequant scale
    wscale = jnp.asarray(rng.uniform(1e-3, 2e-3, cout), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, x_shape, dtype=np.int8))

    def f_bf16(i, x, w, b):
        xi = x + i.astype(jnp.bfloat16)
        y = _conv(xi, w, stride).astype(jnp.float32) + b
        y = y * jax.nn.sigmoid(y)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    def f_dyn(i, x, wq, ws, b):
        xi = x + i.astype(jnp.bfloat16)
        s = jnp.max(jnp.abs(xi.astype(jnp.float32))) / 127.0
        q = jnp.clip(
            jnp.round(xi.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        y = _conv(q, wq, stride, acc=jnp.int32).astype(jnp.float32)
        y = y * (s * ws) + b
        y = y * jax.nn.sigmoid(y)
        return jnp.sum(y) * 1e-9

    def f_chain(i, xq, wq, ws, b):
        xi = (xq + i.astype(jnp.int8)).astype(jnp.int8)  # wraps; timing only
        y = _conv(xi, wq, stride, acc=jnp.int32).astype(jnp.float32)
        y = y * (0.017 * ws) + b  # static input scale
        y = y * jax.nn.sigmoid(y)
        out = jnp.clip(jnp.round(y * (1.0 / 0.021)), -127, 127).astype(jnp.int8)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    ms_b = marginal_ms(f_bf16, (xf, wf, bias))
    ms_d = marginal_ms(f_dyn, (xf, wq, wscale, bias))
    ms_c = marginal_ms(f_chain, (xq, wq, wscale, bias))
    print(
        f"{name:38s} bf16 {ms_b:7.3f}   w8a8_dyn {ms_d:7.3f} "
        f"({ms_b / ms_d:4.2f}x)   w8a8_chain {ms_c:7.3f} ({ms_b / ms_c:4.2f}x)"
    )


def main():
    print(f"devices: {jax.devices()}")
    B = 128
    case("stem k3s2 [B,640,640,3]->16", (B, 640, 640, 3), 3, 16, 2)
    case("k3s2 [B,320,320,16]->32", (B, 320, 320, 16), 3, 32, 2)
    case("c2f  k3s1 [B,160,160,32]->32", (B, 160, 160, 32), 3, 32, 1)
    case("k3s2 [B,160,160,32]->64", (B, 160, 160, 32), 3, 64, 2)
    case("c2f  k3s1 [B,80,80,64]->64", (B, 80, 80, 64), 3, 64, 1)
    case("1x1  [B,80,80,128]->64", (B, 80, 80, 128), 1, 64, 1)
    case("head k3s1 [B,80,80,64]->64", (B, 80, 80, 64), 3, 64, 1)
    case("k3s1 [B,40,40,128]->128", (B, 40, 40, 128), 3, 128, 1)
    case("k3s1 [B,20,20,256]->256", (B, 20, 20, 256), 3, 256, 1)


if __name__ == "__main__":
    main()
