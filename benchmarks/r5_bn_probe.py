"""Round-5 BN probe (VERDICT r4 item 1b): bound the train-mode BatchNorm
opportunity by measurement.

Analysis first (PERF.md round-5): flax BatchNorm already computes batch
stats in ONE fused f32-accumulating reduce (use_fast_variance) and the
normalize (x - mean) * mul + bias stays in registers inside the
normalize+SiLU fusion (bf16 in / bf16 out). The train-mode BN cost above
the folded deploy graph is therefore exactly (a) one extra read of each
conv output for the stats reduce, and (b) the [C]-sized stat writes —
"folding scale/shift into the conv epilogue" is structurally impossible
because the scale/shift DEPEND on the full conv output (batch stats).

This probe measures that bound: the full train step with normal train-mode
BN vs the same step with BN frozen to running stats (stats reduce + stat
writes gone, normalize+SiLU identical). The delta is the ENTIRE remaining
BN-train opportunity; if it is small, the 3.5 ms chunk from the r3 profile
is mostly the un-removable normalize pass and the lever is a measured
dead end.

Usage: python benchmarks/r5_bn_probe.py [arch] [batch] [max_gt] [n_valid]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(arch="n", bs=128, max_gt=128, n_gt=32, n_iter=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.nn import blocks
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache
    from benchmarks.r5_assigner_ab import build_step

    enable_compilation_cache()
    img = int(os.environ.get("R5_AB_IMG", "640"))
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.1, 0.9, (bs, max_gt, 2)).astype(np.float32)
    sizes = rng.uniform(0.02, 0.4, (bs, max_gt, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((bs, img, img, 3)), jnp.float32
        ),
        "boxes": jnp.asarray(np.concatenate([centers, sizes], -1)),
        "labels": jnp.asarray(rng.integers(0, 80, (bs, max_gt)), jnp.int32),
        "mask": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(bs, 0),
    }

    rows = []
    for frozen in (False, True):
        blocks._PROBE_BN_FROZEN = frozen
        step, fresh_state = build_step(arch, bs, img)
        state, m = step(fresh_state(), batch)
        _ = float(jax.device_get(m["total_loss"]))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, m = step(state, batch)
        _ = float(jax.device_get(m["total_loss"]))
        dt = (time.perf_counter() - t0) / n_iter
        rows.append(
            {"bn": "frozen" if frozen else "train", "step_ms": round(dt * 1e3, 1)}
        )
        print(json.dumps(rows[-1]), flush=True)
        del step, state, m
    blocks._PROBE_BN_FROZEN = False
    print(
        json.dumps(
            {
                "arch": arch,
                "batch": bs,
                "bn_train_stats_cost_ms": round(
                    rows[0]["step_ms"] - rows[1]["step_ms"], 1
                ),
                "note": "delta = stats reduce + stat writes; normalize pass "
                "identical in both legs (un-removable, fused with SiLU)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("--")]
    main(
        a[0] if a else "n",
        int(a[1]) if len(a) > 1 else 128,
        int(a[2]) if len(a) > 2 else 128,
        int(a[3]) if len(a) > 3 else 32,
    )
