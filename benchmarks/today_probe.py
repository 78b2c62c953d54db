"""Same-session wall-clock snapshot of the headline serving configs.

Prints today's numbers for the two scored rows (v8-n bs=128 e2e-deploy and
yolo-ms-xs bs=128 e2e-deploy) plus bare forwards, so optimization A/Bs in
this session have an in-session baseline (cross-session drift is +-10-20%,
PERF.md). Usage: python benchmarks/today_probe.py [arch ...]
"""

from __future__ import annotations

import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    sys.path.insert(0, "benchmarks")
    from detailed import scan_time

    enable_compilation_cache()
    archs = sys.argv[1:] or ["n", "yolo-ms-xs"]
    nc, bs = 80, 128
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    for arch in archs:
        model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
        v = init_model(model, jax.random.PRNGKey(0), (640, 640))
        folded = fold_batchnorm(v)
        imgs = jax.device_put(
            jnp.asarray(rng.integers(0, 256, (bs, 640, 640, 3), dtype=np.uint8))
        )
        x = imgs.astype(jnp.bfloat16) / 255.0

        def fwd(i, v_, x_):
            with deploy_mode():
                raw = model.apply(
                    v_, x_ + i.astype(jnp.bfloat16) * 1e-3, train=False
                )
            return sum(m.astype(jnp.float32).sum() for m in raw)

        def e2e(i, v_, imgs_):
            xb = device_normalize_images(imgs_ + i.astype(jnp.uint8), jnp.bfloat16)
            with deploy_mode():
                raw = model.apply(v_, xb, train=False, split_head=True)
            out = fused_postprocess(raw, nc)
            return out["scores"].sum()

        dt_f = scan_time(fwd, (folded, x))
        dt_e = scan_time(e2e, (folded, imgs))
        print(
            f"{arch} bs={bs}: fwd {dt_f * 1e3:.2f} ms ({bs / dt_f:.0f} img/s) | "
            f"e2e-deploy {dt_e * 1e3:.2f} ms ({bs / dt_e:.0f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
