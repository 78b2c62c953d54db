"""Pallas TPU kernel: fused per-anchor selection over a raw head map.

One streaming pass over a flattened head map [B, HW, 4*reg_max + nc] (bf16
on the serving path) producing, per anchor:

  - max class logit           (f32)  — top-k / score key (sigmoid deferred)
  - argmax class id           (int32, first-index tie-break)
  - DFL expectation l,t,r,b   (f32)  — softmax-expectation over reg_max bins

This replaces the XLA tail stages that dominated post-process cost at
bs=128/640px on v5e (benchmarks/tail_probe.py): the max/argmax pass and the
DFL expectation whose exp() intermediate XLA materializes in HBM
([B, A, 64] f32 = 275 MB). In-kernel layout choices (all measured to
matter — a naive v1 ran at ~13 us/grid-step and LOST to XLA):

- class max/argmax run directly on the bf16 slice (comparisons are exact;
  no f32 cast of the [T, nc] block),
- the box slice stays [R, 4*reg_max] f32 (R = Bt*T anchors per block): the
  shared row-max shift is valid — softmax is shift-invariant per side —
  and the per-side softmax + expectation become ONE [4*reg_max, 8] MXU
  dot emitting [num(4) | den(4)] per anchor. (A [R/2, 8*reg_max]
  two-anchors-per-row repack to fill 128-wide lanes was tried and
  abandoned: Mosaic cannot shape-cast sublanes into lanes — see the
  inline note in _select_kernel.)
- one packed [T, 8] f32 output (separate [T, 1] outputs each lane-pad to
  [T, 128] and blew the 16 MB scoped-VMEM limit),
- small scales batch-block (Bt, HW) per grid step so the P4/P5 maps don't
  pay hundreds of tiny DMA steps.

The exp shift is clamped at -60 like nn.blocks.dfl_expectation (same
rationale). Reference semantics reproduced: max-class selection
(tools/test.py:179) and the frozen-arange DFL conv (components.py:162-191).
Equivalence with the XLA path is asserted in tests/test_pallas_select.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Padded-bytes budget for one input block; in/out are double-buffered and
# the f32 temporaries add ~2x the input slab, so this keeps the kernel well
# under the 16 MB scoped-VMEM limit.
_BLOCK_BUDGET = int(1.5 * 1024 * 1024)


def _padded_bytes(rows: int, no: int) -> int:
    lanes = -(-no // 128) * 128
    return rows * lanes * 2  # bf16 input slab


def _select_kernel(x_ref, out_ref, *, nc, reg_max, bt, t):
    nb = 4 * reg_max
    x = x_ref[:].reshape(bt * t, nb + nc)  # [R, no] bf16
    r = bt * t

    # ---- class max/argmax without a wide f32 cast: comparisons are exact
    # in bf16, and the argmax select stays entirely in the bf16 domain
    # (lane ids < 256 are exact bf16 integers; a mixed bf16-mask/i32-value
    # select hits an unsupported Mosaic relayout).
    cls = x[:, nb:]  # [R, nc] input dtype
    mx = jnp.max(cls, axis=-1)  # [R]
    lane = jax.lax.broadcasted_iota(jnp.int32, cls.shape, 1).astype(cls.dtype)
    cid = jnp.min(
        jnp.where(cls == mx[:, None], lane, cls.dtype.type(nc)), axis=-1
    ).astype(jnp.int32)  # [R]

    # ---- DFL: shift in bf16 (max is exact), exp in f32, then ONE
    # [4*reg_max, 8] MXU dot -> [num(4) | den(4)] per anchor. (A [R/2,
    # 2*nb] full-lane repack would halve the exp passes but Mosaic cannot
    # shape-cast sublanes into lanes.)
    box = x[:, :nb].astype(jnp.float32)  # [R, nb]
    c = jnp.max(box, axis=-1, keepdims=True)
    e = jnp.exp(jnp.maximum(box - c, -60.0))  # [R, nb] f32
    i = jax.lax.broadcasted_iota(jnp.int32, (nb, 8), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (nb, 8), 1)
    side = i // reg_max
    match = side == jnp.where(j < 4, j, j - 4)
    w = jnp.where(j < 4, (i % reg_max).astype(jnp.float32), 1.0)
    rhs = jnp.where(match, w, 0.0)
    # HIGHEST: same rationale as nn.blocks.dfl_expectation — default TPU
    # matmul precision rounds the f32 exp values to bf16 (~0.4% relative),
    # up to ~2 px at stride 32 after the x32 decode.
    nd = jnp.dot(
        e,
        rhs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, 8]
    ltrb = nd[:, :4] / nd[:, 4:]

    pad = jnp.zeros((r, 2), jnp.float32)
    out = jnp.concatenate(
        [ltrb, mx.astype(jnp.float32)[:, None], cid.astype(jnp.float32)[:, None], pad],
        axis=1,
    )
    out_ref[:] = out.reshape(bt, t, 8)


def _pick_block(b: int, hw: int, no: int) -> tuple[int, int]:
    """(batch-block, anchor-block): prefer whole-HW blocks batched over
    images; split HW only when one image's map exceeds the budget."""
    if _padded_bytes(hw, no) <= _BLOCK_BUDGET:
        bt = max(1, _BLOCK_BUDGET // _padded_bytes(hw, no))
        while b % bt:
            bt -= 1
        return bt, hw
    for k in range(2, hw + 1):
        if hw % k:
            continue
        t = hw // k
        if t % 16 == 0 and _padded_bytes(t, no) <= _BLOCK_BUDGET:
            return 1, t
    return 1, hw  # VMEM cap will complain if truly huge


def select_supported(hw: int, num_classes: int = 80) -> bool:
    """Kernel requires 16-sublane-aligned anchor counts (true for any input
    whose spatial dims are multiples of 32, the framework invariant) and
    class ids exactly representable as bf16 lane indices (nc <= 255; the
    argmax select runs in the input dtype)."""
    return hw % 16 == 0 and num_classes <= 255


@partial(jax.jit, static_argnames=("num_classes", "reg_max", "interpret"))
def select_scale(
    flat_map: jax.Array,
    num_classes: int,
    reg_max: int = 16,
    interpret: bool = False,
):
    """[B, HW, 4*reg_max+nc] raw map -> (max_logit [B,HW] f32,
    cls_id [B,HW] i32, ltrb [B,HW,4] f32)."""
    b, hw, no = flat_map.shape
    assert no == 4 * reg_max + num_classes
    bt, t = _pick_block(b, hw, no)
    grid = (b // bt, hw // t)
    kernel = partial(_select_kernel, nc=num_classes, reg_max=reg_max, bt=bt, t=t)
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bt, t, no), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (bt, t, 8), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, 8), jnp.float32),
        interpret=interpret,
    )(flat_map)
    return (
        packed[..., 4],
        packed[..., 5].astype(jnp.int32),
        packed[..., :4],
    )
