"""Tracing / profiling utilities — the observability layer the reference
lacks (SURVEY.md §5: only wall-clock prints at train.py:342,393).

- `trace(dir)`: context manager around jax.profiler traces (XProf/Perfetto
  viewable).
- `Timer`: block-until-ready wall-clock timing harness for steady-state
  kernel measurement (warmup + trimmed mean), input-varying to defeat any
  transport-level result caching.
- `enable_compilation_cache(dir)`: persistent XLA compilation cache — remote
  TPU compiles are minutes; caching makes re-runs start instantly.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def enable_compilation_cache(path: str = "/tmp/jax_comp_cache") -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; open with xprof/tensorboard-profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Steady-state timing: f(i) must build/dispatch the computation for
    iteration i (vary inputs with i so nothing can be cached end-to-end)."""

    def __init__(self, warmup: int = 3, iters: int = 20):
        self.warmup = warmup
        self.iters = iters

    def measure(self, f) -> dict:
        for i in range(self.warmup):
            jax.block_until_ready(f(i))
        times = []
        for i in range(self.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(f(self.warmup + i))
            times.append(time.perf_counter() - t0)
        arr = np.asarray(times)
        return {
            "mean_s": float(arr.mean()),
            "median_s": float(np.median(arr)),
            "p10_s": float(np.percentile(arr, 10)),
            "p90_s": float(np.percentile(arr, 90)),
            "iters": self.iters,
        }
