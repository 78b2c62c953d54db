"""Per-op TPU profile of the DEPLOY end-to-end serving graph (fwd + fused
post-process) — round-3 task: find where the ~7 ms bs=128 tail actually goes.

Captures a jax.profiler trace around K scanned e2e passes, converts the
xplane with xprof's raw_to_tool_data into hlo_stats, and prints (a) the top
ops by self time and (b) an aggregate by op category. Usage:

    python benchmarks/profile_e2e.py [arch] [batch] [pre_nms_topk]
"""

from __future__ import annotations

import glob
import json
import os
import sys

K = 10


def capture(arch: str, batch: int, topk: int, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess

    nc = 80
    model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (640, 640))
    folded = fold_batchnorm(variables)

    @jax.jit
    def timed(v, images):
        def body(carry, i):
            imgs = images + i.astype(images.dtype) * 1e-3
            with deploy_mode():
                raw = model.apply(v, imgs, train=False, split_head=True)
            out = fused_postprocess(raw, nc, pre_nms_topk=topk)
            return carry + out["scores"].sum() + out["boxes"].sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
        return acc

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 640, 640, 3)), jnp.bfloat16)
    )
    _ = jax.device_get(timed(folded, x))  # compile + warmup
    with jax.profiler.trace(trace_dir):
        _ = jax.device_get(timed(folded, x))


def report(trace_dir: str) -> None:
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/xprof")
    from convert import raw_to_tool_data as r

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = r.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    table = json.loads(data)
    tbl = table[0] if isinstance(table, list) else table
    cols = [c["label"] for c in tbl["cols"]]
    rows = [[c.get("v") for c in row["c"]] for row in tbl["rows"]]

    def col(label):
        return cols.index(label)

    # column labels observed round 2: 'HLO op text'/'HLO op name', category,
    # self time. Find them defensively.
    cat_i = next(i for i, c in enumerate(cols) if "ategory" in c)
    self_i = next(
        i for i, c in enumerate(cols) if "elf" in c and ("us" in c or "time" in c)
    )
    name_i = next(i for i, c in enumerate(cols) if "name" in c.lower())

    total = sum(float(r[self_i] or 0) for r in rows)
    print(f"total self time: {total / 1e3 / K:.3f} ms/iter over {K} iters")
    agg: dict = {}
    for r_ in rows:
        agg[r_[cat_i]] = agg.get(r_[cat_i], 0.0) + float(r_[self_i] or 0)
    print("\n-- by category (ms/iter) --")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{v / 1e3 / K:8.3f}  {k}")
    print("\n-- top 40 ops (ms/iter) --")
    rows.sort(key=lambda r_: -float(r_[self_i] or 0))
    for r_ in rows[:40]:
        print(
            f"{float(r_[self_i] or 0) / 1e3 / K:8.3f}  {r_[cat_i]:<28} "
            f"{str(r_[name_i])[:110]}"
        )


def main() -> None:
    arch = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    trace_dir = f"/tmp/jax_trace_e2e_{arch}_bs{batch}_k{topk}"
    capture(arch, batch, topk, trace_dir)
    report(trace_dir)


if __name__ == "__main__":
    main()
