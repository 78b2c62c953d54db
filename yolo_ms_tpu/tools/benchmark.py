"""User-facing benchmark CLI: measure any zoo model on the current device.

The closest analog in the reference is the ``main.py`` smoke driver
(/root/reference/main.py:20-74), which forward-runs each version once and
prints shapes — it has no timing surface at all. Performance is first-class
here, so measurement is a first-class CLI: any registry model, any batch
size, three pipeline stages, and the same tunnel-safe methodology as
``bench.py`` (on-device ``lax.scan`` loops with per-iteration input
mutation; a scalar reduced from every iteration is fetched with
``device_get``, the only reliable sync on a remote attachment).

Two numbers per run:
  - ``steady_state``: the marginal rate between a K- and a 5K-iteration
    scan — cancels the fixed per-dispatch cost (~28 ms on the tunnel
    attachment; benchmarks/k_scaling_probe.py) that back-to-back serving
    dispatch amortizes away.
  - ``k_wall``: the plain K-iteration wall per batch (includes 1/K of the
    dispatch cost) — the conservative number.

Usage:
  python -m yolo_ms_tpu.tools.benchmark --arch yolo-ms-xs --batch 128
  python -m yolo_ms_tpu.tools.benchmark --arch n --batch 1 --mode forward
  python -m yolo_ms_tpu.tools.benchmark --arch s --mode train --batch 32
"""

from __future__ import annotations

import argparse
import json
import time


def _scan_rates(fn, args, k: int, reps: int):
    """(steady_state_s, k_wall_s) per iteration of fn folded on device."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(*a):
            def body(c, i):
                return c + fn(i, *a), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
            return acc

        return loop

    lo_f, hi_f = make(k), make(5 * k)
    _ = jax.device_get(lo_f(*args))  # compile + warmup
    _ = jax.device_get(hi_f(*args))
    lo, hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(lo_f(*args))
        lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = jax.device_get(hi_f(*args))
        hi.append(time.perf_counter() - t0)
    k_wall = min(lo) / k
    marginal = (min(hi) - min(lo)) / (4 * k)
    if not 0 < marginal <= k_wall * 1.5:  # cached/anomalous rep guard
        marginal = k_wall
    return marginal, k_wall


def run_benchmark(
    arch: str,
    batch: int,
    mode: str = "e2e",
    img_size: int = 640,
    num_classes: int = 80,
    k: int = 10,
    reps: int = 3,
) -> dict:
    """Measure one (arch, batch, mode) point; returns the report dict.

    mode:
      forward — bf16 model forward only (raw head maps)
      e2e     — full serving pipeline: uint8 normalize -> deploy-folded
                forward -> DFL decode -> batched class-aware NMS
      train   — full compiled train step: forward + TAL assignment +
                CIoU/BCE/DFL loss + backward + optax update + BN stats
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    if mode == "train":
        from yolo_ms_tpu.train.loss import DetectionLoss
        from yolo_ms_tpu.train.optim import build_optimizer
        from yolo_ms_tpu.train.trainer import TrainState, make_train_step
        from yolo_ms_tpu.utils.config import TrainingConfig

        model = build_model(arch, num_classes=num_classes, dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.PRNGKey(0), (img_size, img_size))
        loss_fn = DetectionLoss(num_classes=num_classes)
        tx, _ = build_optimizer(TrainingConfig(batch_size=batch, epochs=1), 100)
        step = jax.jit(make_train_step(model, loss_fn, tx))
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        max_gt = 32
        data = {
            "images": jnp.asarray(
                rng.standard_normal((batch, img_size, img_size, 3)), jnp.float32
            ),
            "boxes": jnp.tile(
                jnp.asarray([0.5, 0.5, 0.4, 0.4], jnp.float32),
                (batch, max_gt, 1),
            ),
            "labels": jnp.zeros((batch, max_gt), jnp.int32),
            "mask": jnp.asarray(
                np.arange(max_gt)[None, :] < 8, jnp.bool_
            ).repeat(batch, axis=0),
        }

        def fn(i, state, data):
            d = dict(data)
            d["images"] = d["images"] + i.astype(jnp.float32) * 1e-3
            _, metrics = step(state, d)
            return metrics["total_loss"]

        steady, wall = _scan_rates(fn, (state, data), k, reps)
    else:
        model = build_model(arch, num_classes=num_classes, dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.PRNGKey(0), (img_size, img_size))
        if mode == "e2e":
            from yolo_ms_tpu.data.augment import device_normalize_images
            from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
            from yolo_ms_tpu.ops.postprocess import fused_postprocess

            variables = fold_batchnorm(variables)
            images = jnp.asarray(
                rng.integers(0, 256, (batch, img_size, img_size, 3), dtype=np.uint8)
            )

            def fn(i, v, imgs):
                x = device_normalize_images(imgs + i.astype(jnp.uint8), jnp.bfloat16)
                with deploy_mode():
                    raw = model.apply(v, x, train=False, split_head=True)
                out = fused_postprocess(raw, num_classes)
                return out["scores"].sum() + out["boxes"].sum()

        elif mode == "forward":
            images = jnp.asarray(
                rng.standard_normal((batch, img_size, img_size, 3)), jnp.bfloat16
            )

            def fn(i, v, imgs):
                raw = model.apply(
                    v, imgs + i.astype(jnp.bfloat16) * 1e-3, train=False
                )
                return sum(jnp.sum(r.astype(jnp.float32)) for r in raw)

        else:
            raise ValueError(f"unknown mode {mode!r} (forward|e2e|train)")
        steady, wall = _scan_rates(fn, (variables, images), k, reps)

    import jax as _jax

    return {
        "arch": arch,
        "mode": mode,
        "batch": batch,
        "img_size": img_size,
        "device": str(_jax.devices()[0]),
        "steady_state_ms_per_batch": round(steady * 1e3, 3),
        "steady_state_img_per_s": round(batch / steady, 1),
        "k_wall_ms_per_batch": round(wall * 1e3, 3),
        "k_wall_img_per_s": round(batch / wall, 1),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--arch", default="yolo-ms-xs", help="any registry name")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--mode", default="e2e", choices=["forward", "e2e", "train"])
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--num_classes", type=int, default=80)
    p.add_argument("--k", type=int, default=10, help="scan iterations")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)
    report = run_benchmark(
        args.arch,
        args.batch,
        mode=args.mode,
        img_size=args.img_size,
        num_classes=args.num_classes,
        k=args.k,
        reps=args.reps,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
