"""Probe: what does the on-device uint8 normalize actually cost in the
deploy e2e graph? (candidate r3 lever: fold mean/std into conv0)

Three same-run variants on v8-n bs=128, full deploy pipeline:
  a) u8 -> /255 -> (-mean)/std -> fwd -> fused tail   (shipped bench path)
  b) u8 -> single fused fma (x*s + t)                 (algebraically equal)
  c) u8 -> plain cast/255 only (NO mean/std)          (lower bound; not
     semantically equal — bounds the fold-into-conv0 win)
"""

from __future__ import annotations

import time

K = 10


def main(batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend())
    model = build_model("n", num_classes=80, dtype=jnp.bfloat16)
    variables = fold_batchnorm(init_model(model, jax.random.PRNGKey(0), (640, 640)))
    mean = jnp.asarray(IMAGENET_MEAN, jnp.bfloat16)
    std = jnp.asarray(IMAGENET_STD, jnp.bfloat16)
    s = (1.0 / (255.0 * np.asarray(IMAGENET_STD))).astype(np.float32)
    t = (-np.asarray(IMAGENET_MEAN) / np.asarray(IMAGENET_STD)).astype(np.float32)
    s16, t16 = jnp.asarray(s, jnp.bfloat16), jnp.asarray(t, jnp.bfloat16)

    def tail(x):
        with deploy_mode():
            raw = model.apply(variables, x, train=False, split_head=True)
        out = fused_postprocess(raw, 80)
        return out["scores"].sum() + out["boxes"].sum()

    variants = {
        "norm_chain": lambda u8: tail(
            ((u8.astype(jnp.bfloat16) / 255.0) - mean) / std
        ),
        "norm_fma": lambda u8: tail(u8.astype(jnp.bfloat16) * s16 + t16),
        "cast_only": lambda u8: tail(u8.astype(jnp.bfloat16) / 255.0),
    }

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, 640, 640, 3), dtype=np.uint8))
    )

    def timeit(fn):
        @jax.jit
        def loop(u8):
            def body(c, i):
                return c + fn(u8 + i.astype(jnp.uint8)), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        _ = jax.device_get(loop(imgs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(loop(imgs))
            ts.append((time.perf_counter() - t0) / K)
        return min(ts) * 1e3

    for name, fn in variants.items():
        ms = timeit(fn)
        print(f"{name}: {ms:.2f} ms  ({batch / ms * 1e3:.0f} img/s)")


if __name__ == "__main__":
    main()
