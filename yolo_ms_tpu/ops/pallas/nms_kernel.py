"""Pallas TPU kernel: VMEM-resident NMS suppression (BASELINE config #4).

One grid step per image computes the whole suppression in on-chip VMEM: the
pairwise IoU matrix (N x N, ~4 MB for N=1024 fp32), the lower-triangular
overlap mask, and the iterated refinement sweeps to the exact greedy fixed
point — without ever materializing the IoU matrix to HBM (the XLA version
writes/reads it between sweeps). HBM traffic per image is one read of the
packed boxes/scores (~32 KB) and one write of the keep mask.

Data layout (TPU tiling rules: last two block dims must be (8k, 128m) or
full-size):
  input  packed [B, N, 8] f32  = [x1, y1, x2, y2, score, 0, 0, 0]
  output keep   [B, 8, N] i32  (row 0 is the mask; rows broadcast)

Inputs are pre-sorted by descending score (as in ops/nms.py); rows with
score <= 0 are padding. Use interpret=True on CPU (tests).

Status (measured on v5e, bs=32, N=1024): 5.7 ms vs 2.2 ms for the XLA
refinement in ops/nms.py — Mosaic cannot lower a data-dependent while_loop
here, so the kernel runs all _NUM_SWEEPS unrolled [8,N]x[N,N] matmuls while
the XLA path early-exits after ~3-5 sweeps. The XLA path therefore remains
the production default in ops.nms.batched_nms; this kernel is the
VMEM-resident alternative (exact parity verified on TPU) and the base for a
future fused decode+top-k+NMS kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NUM_SWEEPS = 32


def _nms_kernel(thresh_ref, data_ref, keep_ref):
    """data [1, N, 8] (x1,y1,x2,y2,score,...), keep [1, 8, N] i32 out."""
    data = data_ref[0]  # [N, 8]
    n = data.shape[0]
    thresh = thresh_ref[0]

    x1 = data[:, 0]
    y1 = data[:, 1]
    x2 = data[:, 2]
    y2 = data[:, 3]
    scores = data[:, 4]
    area = (x2 - x1) * (y2 - y1)

    # pairwise IoU in VMEM: [N, N]
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0.0) * jnp.clip(iy2 - iy1, 0.0)
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-7)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # overlap_t[j, i] = 1 iff higher-ranked j (j < i) can suppress i
    overlap_t = jnp.where((iou > thresh) & (col < row), 1.0, 0.0).T

    # All-2D float state (Mosaic lowers neither scf.while nor scf.for here,
    # and prefers >=2D tile-aligned values), sweeps unrolled. Each sweep
    # finalizes at least the next greedy prefix position; _NUM_SWEEPS=32 is
    # exact for suppression/revival chains up to depth 32 — far beyond
    # anything non-adversarial (typical convergence: 3-5 sweeps).
    valid = jnp.where(scores > 0.0, 1.0, 0.0)[None, :]  # [1, N]
    valid8 = jnp.broadcast_to(valid, (8, n))
    keep = valid8
    for _ in range(_NUM_SWEEPS):
        supp = jnp.dot(keep, overlap_t, preferred_element_type=jnp.float32)
        keep = valid8 * jnp.where(supp > 0.0, 0.0, 1.0)
    keep_ref[0] = keep.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched VMEM NMS: boxes [B,N,4] f32 sorted by descending score,
    scores [B,N] (<=0 marks padding). Returns keep mask [B,N] bool.

    N must be a multiple of 128 (lane tiling); 512/1024 are the intended
    operating points (IoU matrix 1 MB / 4 MB in VMEM).
    """
    b, n, _ = boxes.shape
    assert n % 128 == 0, f"N must be a multiple of 128, got {n}"
    packed = jnp.concatenate(
        [
            boxes.astype(jnp.float32),
            scores.astype(jnp.float32)[..., None],
            jnp.zeros((b, n, 3), jnp.float32),
        ],
        axis=-1,
    )
    thresh = jnp.full((1,), iou_thresh, jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 8, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thresh, packed)
    return keep[:, 0, :] > 0
