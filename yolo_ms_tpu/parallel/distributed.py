"""Multi-host initialization — the cross-host (DCN) layer.

The reference has no distributed backend at all (SURVEY.md §2.4). For TPU
pods/multi-slice, call `maybe_initialize_distributed()` once at program
start: on single-host it is a no-op; on multi-host environments (TPU pod
slices expose coordinator env vars) it runs `jax.distributed.initialize`,
after which `jax.devices()` spans all hosts and the same mesh/psum code
covers ICI within a slice and DCN across slices transparently.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host. Returns True if
    initialization happened."""
    import jax

    explicit = coordinator_address is not None

    def _sane(value: str | None) -> bool:
        # some environments export placeholder/warning strings (e.g.
        # "WARNING: could not determine TPU worker hostnames"); a real
        # coordinator value is a hostname[:port] with no whitespace
        return bool(value) and " " not in value

    env_driven = any(
        _sane(os.environ.get(k))
        for k in (
            "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not explicit and not env_driven:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError) as e:
        # already initialized, or single-process run with stray env vars
        if "already" in str(e).lower():
            return True
        print(f"jax.distributed.initialize skipped: {e}")
        return False


def is_primary_process() -> bool:
    """True on the process that should own shared-filesystem writes
    (checkpoints, best_metric.json, TensorBoard events). On a pod every
    host runs the same training script against the same output dir; only
    process 0 may write, or concurrent writers corrupt/interleave the
    artifacts. Safe to call before jax is initialized (returns True)."""
    import sys

    jax = sys.modules.get("jax")
    if jax is None:
        return True
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True


def global_max_int(value: int) -> int:
    """Agree on ``max(value)`` across all processes (single-host: identity).

    For per-batch decisions that must be uniform across hosts — e.g. which
    GT-bucket jit specialization of the train step to run (`Trainer._bucket_gt`)
    — every process must execute the same XLA program or its collectives
    deadlock. Each host computes its local value, then this does ONE tiny
    allgather (DCN on a pod) outside jit and takes the max. Cost is a
    sub-millisecond roundtrip per call, negligible against a ~100 ms train
    step; only called when the caller's feature is enabled.
    """
    import jax

    if jax.process_count() == 1:
        return int(value)
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.int32(value))
    return int(np.max(gathered))


def barrier(tag: str, timeout_s: float = 600.0) -> None:
    """Rendezvous all processes via the coordination service (no device
    collective, no compile). Single-host: no-op.

    The use case is compile-skew fencing: the first execution of a jitted
    program's collectives opens peer connections with a finite handshake
    timeout (XLA's CPU Gloo KV exchange gives up after 30 s; TPU barriers
    are also bounded). When hosts compile the same program at different
    speeds, the fast host can reach the collective and time out while a
    peer is still compiling. AOT-compile, then barrier, then execute —
    `Trainer` does this for every new train/eval specialization.
    """
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialized through a non-standard path
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
        return
    client.wait_at_barrier(tag, timeout_in_ms=int(timeout_s * 1000))


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
