"""Round-5 train-step A/B: assigner lowering variants (VERDICT r4 item 1).

Times the FULL jitted train step (forward+backward+optax, donated state)
under each trace-time assigner variant at the shipped operating point, and
first asserts each variant's (loss, num_fg) is BIT-IDENTICAL to the default
from the same initial state + batch (the CPU equivalence suite is
tests/test_assigner_variants.py; this re-checks on the real TPU lowering).

Variants (yolo_ms_tpu/train/assigner.py):
  cls:  einsum (default) | pad128 | swap | gather   — the [B,A,nc]x[B,M,nc]
        cls-score contraction (r3 profile: 3.6 ms fused chunk)
  topk: argmax (default) | block                    — the k argmax passes
        (~5 ms; block = hierarchical two-level top-k, 1 full read + k
        small gathers instead of k full reads)

Usage: python benchmarks/r5_assigner_ab.py [arch] [batch] [max_gt] [n_valid]
"""

from __future__ import annotations

import json
import sys
import time


def build_step(arch, bs, img=640):
    import jax
    import jax.numpy as jnp

    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.train.loss import DetectionLoss
    from yolo_ms_tpu.train.optim import build_optimizer
    from yolo_ms_tpu.train.trainer import TrainState, make_train_step
    from yolo_ms_tpu.utils.config import TrainingConfig

    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    v = init_model(model, jax.random.PRNGKey(0), (img, img))
    loss_fn = DetectionLoss(num_classes=80)
    tx, _ = build_optimizer(TrainingConfig(batch_size=bs, epochs=10), 100)
    step = jax.jit(make_train_step(model, loss_fn, tx), donate_argnums=0)

    def fresh_state():
        return TrainState(
            params=v["params"],
            batch_stats=v["batch_stats"],
            opt_state=tx.init(v["params"]),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )

    return step, fresh_state


def main(arch="n", bs=128, max_gt=128, n_gt=32, n_iter=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.train import assigner
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() != "cpu" or "--cpu-ok" in sys.argv, (
        "TPU probe fell back to CPU (exclusive-access rule?); "
        "pass --cpu-ok to force"
    )

    import os

    img = int(os.environ.get("R5_AB_IMG", "640"))  # CPU smoke: R5_AB_IMG=64
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.1, 0.9, (bs, max_gt, 2)).astype(np.float32)
    sizes = rng.uniform(0.02, 0.4, (bs, max_gt, 2)).astype(np.float32)
    # f32 images by default — matches benchmarks/train_probe.py, whose
    # numbers are the r3/r4 baseline rows this A/B is compared against
    uint8_images = os.environ.get("TRAIN_PROBE_UINT8") == "1"
    images = (
        jnp.asarray(rng.integers(0, 256, (bs, img, img, 3)), jnp.uint8)
        if uint8_images
        else jnp.asarray(rng.standard_normal((bs, img, img, 3)), jnp.float32)
    )
    batch = {
        "images": images,
        "boxes": jnp.asarray(np.concatenate([centers, sizes], -1)),
        "labels": jnp.asarray(rng.integers(0, 80, (bs, max_gt)), jnp.int32),
        "mask": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(bs, 0),
    }

    variants = [
        ("einsum", "argmax"),  # baseline FIRST (same-session comparison)
        ("einsum", "block"),
        ("pad128", "argmax"),
        ("swap", "argmax"),
        ("gather", "argmax"),
        ("pad128", "block"),
    ]
    ref_bits = None
    rows = []
    for cls_v, topk_v in variants:
        assigner._VARIANT_CLS = cls_v
        assigner._VARIANT_TOPK = topk_v
        assigner.task_aligned_assign.clear_cache()
        step, fresh_state = build_step(arch, bs, img)

        # ONE compile per variant: the first (donated) call doubles as the
        # bit-equality check — same fresh state + batch for every variant
        state, m0 = step(fresh_state(), batch)
        bits = (
            np.asarray(jax.device_get(m0["total_loss"])).tobytes(),
            np.asarray(jax.device_get(m0["num_fg"])).tobytes(),
        )
        if ref_bits is None:
            ref_bits = bits
        identical = bits == ref_bits

        state, m = step(state, batch)
        _ = float(jax.device_get(m["total_loss"]))  # warm + sync
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, m = step(state, batch)
        _ = float(jax.device_get(m["total_loss"]))  # chained -> full sync
        dt = (time.perf_counter() - t0) / n_iter
        row = {
            "cls": cls_v,
            "topk": topk_v,
            "step_ms": round(dt * 1e3, 1),
            "img_per_s": round(bs / dt, 1),
            "bit_identical": bool(identical),
            "loss": round(float(jax.device_get(m0["total_loss"])), 6),
            "num_fg": float(jax.device_get(m0["num_fg"])),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del step, state, m, m0

    base = rows[0]["step_ms"]
    print(
        json.dumps(
            {
                "arch": arch,
                "batch": bs,
                "max_gt": max_gt,
                "n_valid_gt": n_gt,
                "baseline_ms": base,
                "best": min(rows, key=lambda r: r["step_ms"]),
                "all_bit_identical": all(r["bit_identical"] for r in rows),
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
