"""Per-op TPU profile of the jitted TRAIN step (fwd + TAL loss + backward +
optax) — round-3 task: the backward pass is 49% of the step and has never
been op-level attributed. Prints per-category, per-source-line, and top-op
tables from an xprof hlo_stats conversion.

    python benchmarks/profile_train.py [arch] [batch] [max_gt] [n_valid]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

K = 6


def capture(arch, bs, max_gt, n_gt, trace_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.train.loss import DetectionLoss
    from yolo_ms_tpu.train.optim import build_optimizer
    from yolo_ms_tpu.train.trainer import TrainState, make_train_step
    from yolo_ms_tpu.utils.config import TrainingConfig

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
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.1, 0.9, (bs, max_gt, 2)).astype(np.float32)
    sizes = rng.uniform(0.02, 0.4, (bs, max_gt, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (bs, 640, 640, 3)), jnp.uint8),
        "boxes": jnp.asarray(np.concatenate([centers, sizes], -1)),
        "labels": jnp.asarray(rng.integers(0, 80, (bs, max_gt)), jnp.int32),
        "mask": jnp.asarray(np.arange(max_gt)[None] < n_gt).repeat(bs, 0),
    }
    state, m = step(state, batch)
    _ = float(m["total_loss"])  # compile + warmup sync
    with jax.profiler.trace(trace_dir):
        for _ in range(K):
            state, m = step(state, batch)
        _ = float(m["total_loss"])


def report(trace_dir):
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/xprof")
    from convert import raw_to_tool_data as r

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = r.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    tbl = json.loads(data)
    tbl = tbl[0] if isinstance(tbl, list) else tbl
    cols = [c["label"] for c in tbl["cols"]]
    rows = [[c.get("v") for c in row["c"]] for row in tbl["rows"]]
    self_i = cols.index("Total self time (us)")
    cat_i = cols.index("HLO op category")
    name_i = cols.index("HLO op name")
    fw_i = cols.index("Framework op name")
    src_i = cols.index("Source Info")

    total = sum(float(r_[self_i] or 0) for r_ in rows)
    print(f"total self time: {total / 1e3 / K:.3f} ms/step")

    def agg_by(fn, title, limit=24):
        agg = {}
        for r_ in rows:
            key = fn(r_)
            agg[key] = agg.get(key, 0.0) + float(r_[self_i] or 0)
        print(f"\n-- {title} (ms/step) --")
        for k_, v_ in sorted(agg.items(), key=lambda kv: -kv[1])[:limit]:
            print(f"{v_ / 1e3 / K:8.3f}  {k_}")

    agg_by(lambda r_: r_[cat_i], "by category")

    def src_key(r_):
        m = re.search(r"([\w./]+\.py):(\d+)", str(r_[src_i] or ""))
        return f"{m.group(1).split('/')[-1]}:{m.group(2)}" if m else "(none)"

    agg_by(src_key, "by source line", limit=30)

    def phase(r_):
        fw = str(r_[fw_i] or "")
        if "transpose" in fw:  # autodiff VJP ops
            return "backward"
        if "assigner" in fw or "tal" in fw.lower():
            return "assigner"
        if "loss" in fw:
            return "loss"
        if "adam" in fw or "scale_by" in fw or "apply_updates" in fw:
            return "optimizer"
        return "forward/other"

    agg_by(phase, "by phase (framework-op heuristic)")

    print("\n-- top 40 ops (ms/step) --")
    rows.sort(key=lambda r_: -float(r_[self_i] or 0))
    for r_ in rows[:40]:
        fw = str(r_[fw_i] or "")[:80]
        print(
            f"{float(r_[self_i] or 0) / 1e3 / K:8.3f}  {r_[cat_i]:<24} "
            f"{str(r_[name_i])[:40]:<42} {fw}"
        )


def main():
    a = sys.argv[1:]
    arch = a[0] if a else "n"
    bs = int(a[1]) if len(a) > 1 else 128
    max_gt = int(a[2]) if len(a) > 2 else 128
    n_gt = int(a[3]) if len(a) > 3 else 32
    trace_dir = f"/tmp/jax_trace_train_{arch}_bs{bs}_gt{max_gt}"
    capture(arch, bs, max_gt, n_gt, trace_dir)
    report(trace_dir)


if __name__ == "__main__":
    main()
