"""Probe: AUTO entry layouts for the deploy graph's parameters.

XLA chooses internal (activation) layouts freely, but ENTRY buffers —
the params pytree and the image batch — default to row-major; any
relayout XLA wants for them becomes a copy INSIDE the serving graph,
paid on every dispatch. (The scan-based bench harness hoists those
copies out of the loop as loop-invariant, so steady-state scan numbers
never see them — but real `jit(fwd)(params, x)` serving does.)

jax.jit(in_shardings=Format(Layout.AUTO)) lets XLA pick entry layouts;
params are then device_put once into the chosen layouts and the copies
leave the graph. This probe reports which params get a non-default
layout and the total bytes behind them.

VERDICT (2026-08-18, v8-n): XLA picks non-default layouts for 45/126
params at bs=128 (8/126 at bs=1) — but the ceiling is arithmetic, not
measurement: ALL of v8-n's params are ~12.6 MB f32, so even relaying
every one costs ~16 us at HBM bandwidth, <= 0.02 ms of a ~15 ms
dispatch. Entry-param layouts are NOT where the profiled
"data formatting" time lives (those are activation relayouts internal
to the graph, which XLA already places freely). Dead end; probe kept
as the decision record. NOTE: do not trust back-to-back dispatch wall
timing over this tunnel — block_until_ready does not synchronize
(bench.py module docstring); only device_get does.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/layout_probe.py [arch]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
from yolo_ms_tpu.models.registry import build_model, init_model
from yolo_ms_tpu.ops.postprocess import fused_postprocess


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "n"
    num_classes = 80
    model = build_model(arch, num_classes=num_classes, dtype=jnp.bfloat16)
    variables = fold_batchnorm(init_model(model, jax.random.PRNGKey(0), (640, 640)))

    def fwd(variables, images_u8):
        x = (images_u8.astype(jnp.bfloat16) - 114.0) * (1.0 / 255.0)
        with deploy_mode():
            raw = model.apply(variables, x, train=False, split_head=True)
        return fused_postprocess(raw, num_classes)

    rng = np.random.default_rng(0)
    for bs in (1, 128):
        images = jnp.asarray(
            rng.integers(0, 256, (bs, 640, 640, 3), dtype=np.uint8)
        )

        f_auto = jax.jit(fwd, in_shardings=(Format(Layout.AUTO), None))
        compiled = f_auto.lower(variables, images).compile()
        var_fmt = compiled.input_formats[0][0]
        # count params whose chosen layout differs from default row-major,
        # and the bytes behind them (= the per-dispatch copy ceiling)
        flat_v, _ = jax.tree.flatten(variables)
        flat_f, _ = jax.tree.flatten(
            var_fmt, is_leaf=lambda x: isinstance(x, Format)
        )
        nondefault, nd_bytes, total_bytes = 0, 0, 0
        for v, f in zip(flat_v, flat_f):
            total_bytes += v.size * v.dtype.itemsize
            major_to_minor = getattr(f.layout, "major_to_minor", None)
            if major_to_minor is not None and tuple(major_to_minor) != tuple(
                range(v.ndim)
            ):
                nondefault += 1
                nd_bytes += v.size * v.dtype.itemsize
        print(
            f"{arch} bs={bs}: non-default param layouts {nondefault}/"
            f"{len(flat_v)} ({nd_bytes / 1e6:.2f} of {total_bytes / 1e6:.2f} "
            f"MB => ~{nd_bytes / 800e9 * 1e6:.1f} us/dispatch copy ceiling "
            "at 800 GB/s)"
        )


if __name__ == "__main__":
    main()
