"""Probe: headline serving batch-size re-sweep on the CURRENT deploy graph.

bench.py's bs=128 operating point was chosen from an early-round sweep
(873/1900/2900/2800 img/s at 32/64/128/256) that predates the deploy BN
folding, split-head tail, upsample-commute conv, MS depthwise barriers and
the steady-state (two-point marginal rate) methodology. Re-sweep so the
headline batch is optimal for the graph we actually ship.

Usage: python benchmarks/bs_sweep_probe.py [arch] [bs ...]
"""

from __future__ import annotations

import json
import sys
import time

K = 10


def measure(arch: str, batch: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess

    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    variables = fold_batchnorm(init_model(model, jax.random.PRNGKey(0), (640, 640)))

    def pipeline(v, images_u8):
        x = device_normalize_images(images_u8, jnp.bfloat16)
        with deploy_mode():
            raw = model.apply(v, x, train=False, split_head=True)
        out = fused_postprocess(raw, 80)
        return out["scores"].sum() + out["boxes"].sum()

    def make_timed(k):
        @jax.jit
        def timed(v, images_u8):
            def body(carry, i):
                return carry + pipeline(v, images_u8 + i.astype(jnp.uint8)), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc

        return timed

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, 640, 640, 3), dtype=np.uint8))
    )
    timed_lo, timed_hi = make_timed(K), make_timed(5 * K)
    _ = jax.device_get(timed_lo(variables, images))
    _ = jax.device_get(timed_hi(variables, images))
    lo, hi = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(timed_lo(variables, images))
        lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = jax.device_get(timed_hi(variables, images))
        hi.append(time.perf_counter() - t0)
    marginal = (min(hi) - min(lo)) / (4 * K)
    return {
        "bs": batch,
        "steady_ms": round(marginal * 1e3, 3),
        "steady_img_per_s": round(batch / marginal, 1),
        "k10_wall_img_per_s": round(batch / (min(lo) / K), 1),
    }


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "yolo-ms-xs"
    sizes = [int(s) for s in sys.argv[2:]] or [96, 128, 160, 192, 256]
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    for bs in sizes:
        print(json.dumps({"arch": arch, **measure(arch, bs)}), flush=True)


if __name__ == "__main__":
    main()
