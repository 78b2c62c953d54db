"""Round-5: does the AUTO-entry-layout serving win survive the bench.py
scan harness? (VERDICT r4 item 5 follow-up.)

r5_serving_ab.py measured single-dispatch e2e: AUTO entry layouts move
yolov8-n 7,589 -> 8,782 img/s (+15.7%) and yolo-ms-xs 4,158 -> 4,458
(+7.2%), with the whole win in the IMAGE entry layout (weights-only AUTO
is 0.97x). bench.py times K pipeline iterations inside ONE lax.scan, so
its images enter the program once; if XLA's layout assignment anchors on
the row-major entry and propagates it through the scan body, the same win
should appear by compiling the scan with AUTO entry layouts — this probe
measures exactly that A/B (same two-point marginal-rate methodology as
bench.py).

Usage: python benchmarks/r5_scan_layout_probe.py [arch] [batch]
"""

from __future__ import annotations

import json
import sys
import time


def main(arch="yolo-ms-xs", bs=128, k=10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.layout import Format, Layout

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    variables = fold_batchnorm(
        init_model(model, jax.random.PRNGKey(0), (640, 640))
    )

    def pipeline(v, images_u8):
        x = device_normalize_images(images_u8, jnp.bfloat16)
        with deploy_mode():
            raw = model.apply(v, x, train=False, split_head=True)
        out = fused_postprocess(raw, 80)
        return out["scores"].sum() + out["boxes"].sum()

    def scan_fn(kk):
        def timed(v, images_u8):
            def body(carry, i):
                imgs = images_u8 + i.astype(jnp.uint8)
                return carry + pipeline(v, imgs), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(kk))
            return acc

        return timed

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (bs, 640, 640, 3), dtype=np.uint8))
    )

    def measure(lo_c, hi_c, v, imgs):
        _ = jax.device_get(lo_c(v, imgs))
        _ = jax.device_get(hi_c(v, imgs))
        lo, hi = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(lo_c(v, imgs))
            lo.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = jax.device_get(hi_c(v, imgs))
            hi.append(time.perf_counter() - t0)
        marginal = (min(hi) - min(lo)) / (4 * k)
        return bs / marginal, marginal

    # default entry layouts (bench.py as shipped)
    base_rate, base_s = measure(
        jax.jit(scan_fn(k)), jax.jit(scan_fn(5 * k)), variables, images
    )
    print(
        json.dumps(
            {
                "leg": "scan-default",
                "img_per_s": round(base_rate, 1),
                "ms_per_batch": round(base_s * 1e3, 3),
            }
        ),
        flush=True,
    )

    # AUTO entry layouts: compile, then device_put inputs into preferred
    # formats (a one-time serving setup cost, outside the timed region)
    def auto_compile(kk):
        j = jax.jit(scan_fn(kk), in_shardings=Format(Layout.AUTO))
        c = j.lower(variables, images).compile()
        fmts = c.input_formats
        if (
            isinstance(fmts, tuple)
            and len(fmts) == 2
            and isinstance(fmts[1], dict)
        ):
            fmts = fmts[0]
        return c, fmts

    c_lo, fmts = auto_compile(k)
    c_hi, _ = auto_compile(5 * k)
    v_fmt, img_fmt = fmts
    v2 = jax.tree_util.tree_map(
        lambda x, f: jax.device_put(x, f), variables, v_fmt
    )
    img2 = jax.device_put(images, img_fmt)
    auto_rate, auto_s = measure(c_lo, c_hi, v2, img2)
    print(
        json.dumps(
            {
                "leg": "scan-auto",
                "img_per_s": round(auto_rate, 1),
                "ms_per_batch": round(auto_s * 1e3, 3),
                "vs_default": round(auto_rate / base_rate, 3),
                "img_fmt": str(img_fmt),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "yolo-ms-xs", int(a[1]) if len(a) > 1 else 128)
