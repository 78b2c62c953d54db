"""Probe: multi-tier adaptive prefix widths in fused_postprocess (r3).

Drives the FULL deploy surface (image-in -> boxes-out) on v8-n at bs=128
with different `prefix_widths` and (a) asserts tier outputs are identical
(the adaptive dispatch is exact by construction), (b) measures e2e img/s
per tier set to pick the shipped default.

Methodology: K iterations inside one on-device lax.scan with per-iteration
input variation (bench.py rules).
"""

from __future__ import annotations

import json
import time

K = 10


def main(batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend())

    model = build_model("n", num_classes=80, dtype=jnp.bfloat16)
    v = init_model(model, jax.random.PRNGKey(0), (640, 640))
    variables = fold_batchnorm(v)
    rng = np.random.default_rng(0)
    img = jax.device_put(
        jnp.asarray(rng.random((batch, 640, 640, 3)), jnp.bfloat16)
    )

    def apply_deploy(x):
        with deploy_mode():
            return model.apply(variables, x, train=False)

    def make_e2e(widths):
        @jax.jit
        def e2e(x):
            def body(carry, i):
                xi = x + i.astype(x.dtype) * 1e-4
                maps = apply_deploy(xi)
                out = fused_postprocess(
                    maps,
                    num_classes=80,
                    prefix_widths=widths,
                )
                return carry + out["boxes"].sum() + out["valid"].sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return e2e

    def timeit(fn, *args):
        _ = jax.device_get(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(fn(*args))
            times.append((time.perf_counter() - t0) / K)
        return min(times) * 1e3

    variants = {
        "dense": (),
        "w256": (256,),
        "w64_256": (64, 256),
        "w128": (128,),
        "w64_128_256": (64, 128, 256),
    }

    # correctness: synthetic raw maps with PLANTED survivor counts that land
    # in every tier band (<=64, <=128, <=256, dense fallback); all variants
    # must produce bit-identical detections. Planted logits are distinct
    # EXACT bf16 values (the bf16 grid has 128 values per octave; [4,8) +
    # [8,16) gives 256 tie-free logits) — on exact score ties, top-k order
    # across different widths may legitimately differ.
    no = 4 * 16 + 80
    bf16_grid = np.concatenate(
        [4.0 + np.arange(128) / 32.0, 8.0 + np.arange(128) / 16.0]
    )
    for planted in (30, 100, 200, 500):
        maps = []
        rng2 = np.random.default_rng(planted)
        for h, w in ((80, 80), (40, 40), (20, 20)):
            m = rng2.standard_normal((4, h, w, no)).astype(np.float32) - 8.0
            maps.append(m)
        # plant `planted` confident anchors per image on the 80x80 scale
        # (>256 planted forces the dense branch in every variant, so ties
        # there are harmless — all variants run the identical graph)
        for bi in range(4):
            flat = rng2.choice(80 * 80, planted, replace=False)
            ys, xs = flat // 80, flat % 80
            cs = rng2.integers(0, 80, planted)
            vals = rng2.permutation(bf16_grid)[: min(planted, 256)]
            if planted > 256:
                vals = np.concatenate(
                    [vals, np.full(planted - 256, bf16_grid[0])]
                )
            maps[0][bi, ys, xs, 64 + cs] = vals
        jmaps = [jnp.asarray(m, jnp.bfloat16) for m in maps]
        ref = None
        for name, widths in variants.items():
            out = jax.device_get(
                fused_postprocess(jmaps, num_classes=80, prefix_widths=widths)
            )
            if ref is None:
                ref = out
            else:
                for kk in ("boxes", "scores", "classes", "valid"):
                    np.testing.assert_array_equal(
                        np.asarray(out[kk], np.float32),
                        np.asarray(ref[kk], np.float32),
                        err_msg=f"planted={planted} {name}:{kk}",
                    )
    print("tier outputs identical across", list(variants))

    results = {}
    for name, widths in variants.items():
        ms = timeit(make_e2e(widths), img)
        results[name] = {"ms": round(ms, 2), "img_per_s": round(batch / ms * 1e3)}
        print(name, results[name])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
