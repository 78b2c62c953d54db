"""Probe: train-step cost vs GT padding capacity (VERDICT round-1 item:
the published train throughput used toy max_gt=16 / 4 valid boxes; the
shipped config default is max_gt=128 and real COCO images average ~7 and
tail to ~90 boxes).

Usage: python benchmarks/train_probe.py [arch] [batch] [max_gt] [n_valid]
"""

from __future__ import annotations

import json
import sys
import time


def main(arch="n", bs=32, max_gt=128, n_gt=32, n_iter=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.train.loss import DetectionLoss
    from yolo_ms_tpu.train.optim import build_optimizer
    from yolo_ms_tpu.train.trainer import TrainState, make_train_step
    from yolo_ms_tpu.utils.config import TrainingConfig
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    v = init_model(model, jax.random.PRNGKey(0), (640, 640))
    loss_fn = DetectionLoss(num_classes=80)
    tx, _ = build_optimizer(TrainingConfig(batch_size=bs, epochs=10), 100)
    step = jax.jit(make_train_step(model, loss_fn, tx), donate_argnums=0)
    state = TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
    )
    import os

    rng = np.random.default_rng(0)
    centers = rng.uniform(0.1, 0.9, (bs, max_gt, 2)).astype(np.float32)
    sizes = rng.uniform(0.02, 0.4, (bs, max_gt, 2)).astype(np.float32)
    uint8_images = os.environ.get("TRAIN_PROBE_UINT8") == "1"
    images = (
        jnp.asarray(rng.integers(0, 256, (bs, 640, 640, 3)), jnp.uint8)
        if uint8_images
        else jnp.asarray(rng.standard_normal((bs, 640, 640, 3)), jnp.float32)
    )
    batch = {
        "images": images,
        "boxes": jnp.asarray(np.concatenate([centers, sizes], -1)),
        "labels": jnp.asarray(rng.integers(0, 80, (bs, max_gt)), jnp.int32),
        "mask": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(bs, 0),
    }
    state, m = step(state, batch)
    _ = float(m["total_loss"])  # sync after compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, m = step(state, batch)
    _ = float(m["total_loss"])  # chained states -> full sync
    dt = (time.perf_counter() - t0) / n_iter
    print(
        json.dumps(
            {
                "arch": arch,
                "batch": bs,
                "max_gt": max_gt,
                "n_valid_gt": n_gt,
                "step_ms": round(dt * 1e3, 1),
                "img_per_s": round(bs / dt, 1),
                "num_fg": float(m["num_fg"]),
                "loss": round(float(m["total_loss"]), 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "n",
        int(a[1]) if len(a) > 1 else 32,
        int(a[2]) if len(a) > 2 else 128,
        int(a[3]) if len(a) > 3 else 32,
    )
