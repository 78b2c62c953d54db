"""Device mesh + sharding rules — the distributed-communication layer.

The reference has NO distributed backend (SURVEY.md §2.4: no
torch.distributed/NCCL anywhere, only passive DataParallel-prefix tolerance).
This module is the TPU-native equivalent layer, designed per the GSPMD
recipe: pick a mesh, annotate array shardings, let XLA insert the ICI
collectives.

Data parallelism = batch dimension sharded over the 'data' mesh axis,
parameters replicated. Under jit+GSPMD:
- gradient all-reduce happens automatically (mean over the global batch is
  compiled to a reduce-scatter/all-gather pair or all-reduce over ICI),
- BatchNorm statistics are computed over the GLOBAL batch (jnp.mean over a
  sharded axis is the global mean) — SyncBN without any extra code; this is
  the TPU equivalent of the syncbn_fast configs in the reference's zoo
  (model_zoos.md:28).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
same psum spans ICI within a slice and DCN across slices transparently.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all local (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a host batch (dict of arrays) with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim >= 1
        else x,
        batch,
    )


def make_mesh_2d(
    data: int, spatial: int, devices=None
) -> Mesh:
    """2-D (data, spatial) hybrid mesh: batch over 'data', image height
    over 'spatial' — hybrid DP x SP for high-resolution training where
    per-chip activation memory (not batch size) is the constraint. The
    train step needs NO changes: GSPMD inserts conv halo exchanges along
    the spatial axis and the gradient/BN reductions span both axes
    (equivalence vs pure DP is asserted in tests/test_spatial_sharding.py).
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) < data * spatial:
        raise ValueError(
            f"need {data * spatial} devices for a {data}x{spatial} mesh, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def hybrid_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images sharded batch-over-'data' and height-over-
    'spatial' (use with make_mesh_2d; GT tensors shard with
    batch_sharding(mesh) — their leading dim is the batch)."""
    return NamedSharding(mesh, P("data", "spatial"))


def spatial_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the image HEIGHT dimension of an NHWC batch over the mesh.

    Spatial partitioning — the detector's analog of sequence parallelism
    (SURVEY.md §2.4): for inputs too large for one chip (high-resolution
    imagery, or latency-critical single images), the [B, H, W, C] tensor is
    split along H and every conv/pool runs on its slice. GSPMD inserts the
    halo exchanges at slice boundaries automatically (kernel_size//2 rows
    per side ride the ICI each conv), so the numerics are IDENTICAL to the
    unsharded forward — verified in tests/test_spatial_sharding.py on the
    virtual mesh. The fused post-process tail reduces over all anchors, so
    its collectives are likewise inserted by the compiler.

    Use batch_sharding when B >= mesh size (more arithmetic intensity per
    chip, no halos); spatial sharding when B < mesh size — e.g. ONE 4096px
    image over 8 chips.
    """
    return NamedSharding(mesh, P(None, axis_name))
