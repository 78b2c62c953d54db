"""A/B: optimization_barrier isolation of the MS depthwise convs.

xprof (r3) showed each neck/backbone expand+k7-depthwise fusion at
~1.0 ms @[128,40,40,128] while the isolated census (dw_probe.py) runs the
same depthwise at ~0.2 ms — XLA's fusion of the 1x1 expand into the
grouped-conv emitter is the pathology. This probes the whole yolo-ms-xs
bs=128 deploy e2e with the barrier toggle off/on, same session.
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
    from yolo_ms_tpu.nn.blocks import dw_isolation
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    sys.path.insert(0, "benchmarks")
    from detailed import scan_rate, scan_time

    enable_compilation_cache()
    arch = sys.argv[1] if len(sys.argv) > 1 else "yolo-ms-xs"
    nc, bs = 80, 128
    model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
    v = init_model(model, jax.random.PRNGKey(0), (640, 640))
    folded = fold_batchnorm(v)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (bs, 640, 640, 3), dtype=np.uint8))
    )
    print(f"device: {jax.devices()[0]}", flush=True)

    def make(min_k, sides="both"):
        def fn(i, v_, imgs_):
            x = device_normalize_images(imgs_ + i.astype(jnp.uint8), jnp.bfloat16)
            with deploy_mode(), dw_isolation(min_k, sides):
                raw = model.apply(v_, x, train=False, split_head=True)
            out = fused_postprocess(raw, nc)
            return out["scores"].sum()

        return fn

    # numerical identity first (barriers must not change values)
    a = jax.jit(lambda v_, im: make(0)(jnp.zeros((), jnp.uint8), v_, im))(
        folded, imgs
    )
    b = jax.jit(lambda v_, im: make(3)(jnp.zeros((), jnp.uint8), v_, im))(
        folded, imgs
    )
    print(f"outputs equal: {bool(jnp.array_equal(a, b))} ({a} vs {b})", flush=True)

    variants = (
        ("base (off)", 0, "both"),
        ("k>=3 pre", 3, "pre"),
        ("k>=5 pre", 5, "pre"),
        ("k>=7 pre", 7, "pre"),
    )
    for label, min_k, sides in variants:
        dt = scan_time(make(min_k, sides), (folded, imgs))
        ss = scan_rate(make(min_k, sides), (folded, imgs))
        print(
            f"{label:12s}: K=10 wall {dt * 1e3:7.2f} ms ({bs / dt:6.0f} img/s) | "
            f"steady {ss * 1e3:7.2f} ms ({bs / ss:6.0f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
