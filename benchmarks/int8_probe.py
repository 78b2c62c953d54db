"""Probe: int8 vs bf16 conv/matmul throughput on v5e.

v5e's MXU has 2x int8 peak (394 TOPS int8 vs 197 TFLOP/s bf16). If XLA
lowers int8 convs to the int8 MXU path, a PTQ int8 serving graph could
roughly double the conv-bound part of the deploy forward. This probe
measures representative hot shapes from the v8-n / yolo-ms-xs deploy
graphs in both dtypes (accumulate int32 / f32), using the same on-device
scan methodology as bench.py (per-iteration input mutation, marginal
rate between K and 5K to cancel the ~28 ms per-dispatch cost).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/int8_probe.py
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


def conv_case(name, x_shape, k, cout, stride, feature_group_count=1):
    rng = np.random.default_rng(0)
    cin = x_shape[-1]
    kin = cin // feature_group_count
    results = {}
    for dt, acc in ((jnp.bfloat16, jnp.bfloat16), (jnp.int8, jnp.int32)):
        if dt == jnp.int8:
            x = jnp.asarray(
                rng.integers(-127, 128, x_shape, dtype=np.int8))
            w = jnp.asarray(
                rng.integers(-127, 128, (k, k, kin, cout), dtype=np.int8))
        else:
            x = jnp.asarray(rng.standard_normal(x_shape), dtype=dt)
            w = jnp.asarray(
                rng.standard_normal((k, k, kin, cout)), dtype=dt)

        def f(i, x, w, _dt=dt, _acc=acc):
            # per-iteration input mutation so the scan body is NOT
            # loop-invariant (int8 add wraps — fine for timing)
            xi = x + i.astype(_dt)
            y = jax.lax.conv_general_dilated(
                xi, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=feature_group_count,
                preferred_element_type=_acc,
            )
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        ms = marginal_ms(f, (x, w))
        flops = (2 * np.prod(x_shape[:3], dtype=np.int64) * k * k
                 * kin * cout / (stride * stride))
        results[str(np.dtype(dt).name if dt != jnp.bfloat16 else "bf16")] = (
            ms, flops / (ms * 1e-3) / 1e12)
    b16, i8 = results["bf16"], results["int8"]
    print(f"{name:44s} bf16 {b16[0]:7.3f} ms ({b16[1]:5.1f} T/s)   "
          f"int8 {i8[0]:7.3f} ms ({i8[1]:5.1f} T/s)   "
          f"speedup {b16[0]/i8[0]:4.2f}x")


def main():
    print(f"devices: {jax.devices()}")
    B = 128
    # dense-dot sanity: int8 MXU path definitely exists for dot_general
    rng = np.random.default_rng(1)
    for dt, acc in ((jnp.bfloat16, jnp.bfloat16), (jnp.int8, jnp.int32)):
        if dt == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 128, (8192, 2048), np.int8))
            b = jnp.asarray(rng.integers(-127, 128, (2048, 2048), np.int8))
        else:
            a = jnp.asarray(rng.standard_normal((8192, 2048)), dtype=dt)
            b = jnp.asarray(rng.standard_normal((2048, 2048)), dtype=dt)

        def f(i, a, b, _dt=dt, _acc=acc):
            ai = a + i.astype(_dt)
            return jnp.sum(
                jax.lax.dot_general(
                    ai, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=_acc,
                ).astype(jnp.float32)) * 1e-9

        ms = marginal_ms(f, (a, b))
        tops = 2 * 8192 * 2048 * 2048 / (ms * 1e-3) / 1e12
        print(f"dot 8192x2048x2048 {np.dtype(dt).name:9s} "
              f"{ms:7.3f} ms ({tops:5.1f} T/s)")

    # v8-n / MS hot conv shapes (deploy graph, bs=128)
    conv_case("stem k3s2 [B,320,320,16]->32", (B, 320, 320, 16), 3, 32, 2)
    conv_case("c2f  k3s1 [B,160,160,32]->32", (B, 160, 160, 32), 3, 32, 1)
    conv_case("k3s2 [B,160,160,32]->64", (B, 160, 160, 32), 3, 64, 2)
    conv_case("c2f  k3s1 [B,80,80,64]->64", (B, 80, 80, 64), 3, 64, 1)
    conv_case("1x1  [B,80,80,64]->128", (B, 80, 80, 64), 1, 128, 1)
    conv_case("head k3s1 [B,80,80,64]->64", (B, 80, 80, 64), 3, 64, 1)
    conv_case("dw k5 [B,80,80,64] (grouped)", (B, 80, 80, 64), 5, 64, 1,
              feature_group_count=64)


if __name__ == "__main__":
    main()
