"""Dead-end record + probe: isolating the assigner cls-score contraction.

r3 train profile showed the [B,A,nc]x[B,M,nc]->[B,M,A] dot shipping as a
'select_convert_fusion' at ~5 TFLOP/s (4.4 ms at n/bs=128/max_gt=128) —
suspiciously slow for an MXU contraction. This probe A/Bs an
optimization_barrier that splits the dot from its metric pow/where
consumers (train/assigner.py `_PROBE_CLS_DOT_BARRIER`).

MEASURED RESULT (2026-08-18, same session): the barrier makes the step 31%
SLOWER — base 116.0 ms (1103 img/s) vs isolated 152.0 ms (842 img/s).
The fusion avoids materializing + re-reading the 275 MB [B,M,A] bf16
intermediate, which beats a clean MXU emitter; it also keeps f32 dot
accumulations flowing into the metric (first-step num_fg differed by
10/38001 across the variants — the isolated form rounds to bf16 first).
Kept as a runnable probe so this isn't re-walked.

Usage: python benchmarks/assigner_barrier_probe.py [arch] [bs] [max_gt] [n_gt]
"""

from __future__ import annotations

import sys
import time


def main(arch="n", bs=128, max_gt=128, n_gt=32, n_iter=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.train import assigner as assigner_mod
    from yolo_ms_tpu.train.loss import DetectionLoss
    from yolo_ms_tpu.train.optim import build_optimizer
    from yolo_ms_tpu.train.trainer import TrainState, make_train_step
    from yolo_ms_tpu.utils.config import TrainingConfig
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    v = init_model(model, jax.random.PRNGKey(0), (640, 640))
    loss_fn = DetectionLoss(num_classes=80)
    tx, _ = build_optimizer(TrainingConfig(batch_size=bs, epochs=10), 100)

    rng = np.random.default_rng(0)
    centers = rng.uniform(0.1, 0.9, (bs, max_gt, 2)).astype(np.float32)
    sizes = rng.uniform(0.02, 0.4, (bs, max_gt, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.standard_normal((bs, 640, 640, 3)), jnp.float32),
        "boxes": jnp.asarray(np.concatenate([centers, sizes], -1)),
        "labels": jnp.asarray(rng.integers(0, 80, (bs, max_gt)), jnp.int32),
        "mask": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(bs, 0),
    }

    for label, on in (("base", False), ("dot-barrier", True)):
        # the flag is read at trace time; the inner jit caches its jaxpr by
        # avals, so force a retrace
        assigner_mod._PROBE_CLS_DOT_BARRIER = on
        assigner_mod.task_aligned_assign.clear_cache()
        # donate_argnums=0 consumes the state's buffers, which alias v —
        # give each variant its own copies
        v_copy = jax.tree.map(jnp.copy, v)
        step = jax.jit(make_train_step(model, loss_fn, tx), donate_argnums=0)
        state = TrainState(
            params=v_copy["params"],
            batch_stats=v_copy["batch_stats"],
            opt_state=tx.init(v_copy["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        state, m = step(state, batch)
        loss0, fg0 = float(m["total_loss"]), float(m["num_fg"])
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, m = step(state, batch)
        _ = float(m["total_loss"])  # chained states -> full sync
        dt = (time.perf_counter() - t0) / n_iter
        print(
            f"{label:12s}: {dt * 1e3:7.2f} ms/step ({bs / dt:6.0f} img/s) | "
            f"first-step loss {loss0:.4f} num_fg {fg0:.0f}",
            flush=True,
        )
    assigner_mod._PROBE_CLS_DOT_BARRIER = False


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "n",
        int(a[1]) if len(a) > 1 else 128,
        int(a[2]) if len(a) > 2 else 128,
        int(a[3]) if len(a) > 3 else 32,
    )
