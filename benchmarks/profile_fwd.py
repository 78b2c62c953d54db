"""Per-op TPU profile of the model forward (VERDICT task: root-cause the
small-batch latency — v8-n bs=32 fwd was ~21 ms vs 13.9 ms at bs=128).

Captures a jax.profiler trace around K scanned forward passes and converts
the xplane with xprof's raw_to_tool_data into an hlo_stats table, printing
the top ops by self time. Usage:

    python benchmarks/profile_fwd.py [arch] [batch] [tool]

tool defaults to hlo_stats; op_profile/overview_page also work.
"""

from __future__ import annotations

import glob
import json
import os
import sys

K = 10


def capture(arch: str, batch: int, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.registry import build_model, init_model

    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (640, 640))

    @jax.jit
    def timed(v, images):
        def body(carry, i):
            raw = model.apply(v, images + i.astype(images.dtype) * 1e-3, train=False)
            return carry + sum(m.astype(jnp.float32).sum() for m in raw), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
        return acc

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 640, 640, 3)), jnp.bfloat16)
    )
    _ = jax.device_get(timed(variables, x))  # compile + warmup
    with jax.profiler.trace(trace_dir):
        _ = jax.device_get(timed(variables, x))


def report(trace_dir: str, tool: str) -> None:
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/xprof")
    from convert import raw_to_tool_data as r

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = r.xspace_to_tool_data([paths[-1]], tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    out = os.path.join(trace_dir, f"{tool}.json")
    with open(out, "w") as f:
        f.write(data)
    print(f"wrote {out}", flush=True)
    if tool == "hlo_stats":
        table = json.loads(data)
        # gviz table: cols + rows
        cols = [c["label"] for c in table[0]["cols"]] if isinstance(table, list) else None
        print(cols)


def main() -> None:
    arch = sys.argv[1] if len(sys.argv) > 1 else "n"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tool = sys.argv[3] if len(sys.argv) > 3 else "hlo_stats"
    trace_dir = f"/tmp/jax_trace_{arch}_bs{batch}"
    capture(arch, batch, trace_dir)
    report(trace_dir, tool)


if __name__ == "__main__":
    main()
