"""Pallas TPU kernel: depthwise k x k convolution (stride 1, SAME), NHWC.

WHY: XLA's depthwise conv on TPU measures ~0.5-0.8 TFLOP/s at YOLO-MS shapes
(e.g. 5x5/g=96 @ [32,80,80,96]: 1.16 ms where pure HBM traffic is ~0.1 ms) —
an order of magnitude off the bandwidth bound, and the MS-Block inverted
bottlenecks make depthwise convs the dominant cost of the MS family forward
pass. This kernel computes the depthwise conv as k^2 unrolled shifted
multiply-adds on VPU registers with the whole (padded) image resident in
VMEM — one HBM read of x, one write of y.

Scope: stride 1, SAME padding, channel multiplier 1 (the only depthwise
shape the models use: nn/blocks.py InvertedBottleneck / MSSPPF). The
backward pass delegates to XLA's conv transpose via custom_vjp, so the
kernel is usable under jax.grad (training) too.

VMEM budget: largest MS depthwise input is 160x160x~48 bf16 ~ 2.5 MB padded;
grid is (batch,) with whole-image blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, w_ref, out_ref, acc_ref, *, k: int, out_h: int, out_w: int):
    """x [1, H+k-1, W+k-1, C] (pre-padded), w [k*k, C], out [1, H, W, C],
    acc: f32 VMEM scratch [H, W, C].

    Per-tap ref-accumulation keeps exactly one shifted term live at a time.
    (Both fully-unrolled functional accumulation and per-kernel-row fused
    expressions OOM VMEM — Mosaic materializes every term of an elementwise
    chain at these tile sizes.)"""
    for dy in range(k):
        for dx in range(k):
            term = (
                x_ref[0, dy : dy + out_h, dx : dx + out_w, :].astype(jnp.float32)
                * w_ref[dy * k + dx, :].astype(jnp.float32)
            )
            if dy == 0 and dx == 0:
                acc_ref[...] = term
            else:
                acc_ref[...] = acc_ref[...] + term
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _dw_forward(x: jax.Array, w: jax.Array, k: int, interpret: bool) -> jax.Array:
    b, h, wd, c = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    w2 = w.reshape(k * k, c)
    kernel = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, out_h=h, out_w=wd),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2 * pad, wd + 2 * pad, c),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, wd, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((h, wd, c), jnp.float32)],
        interpret=interpret,
    )
    return kernel(xp, w2)


def _dw_xla(x: jax.Array, w: jax.Array) -> jax.Array:
    """XLA reference: depthwise conv, SAME, stride 1. w: [k, k, C]."""
    c = x.shape[-1]
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x,
        w.reshape(k, k, 1, c),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def pallas_viable(h: int, w: int, c: int, k: int) -> bool:
    """Whether the whole-image-block kernel fits VMEM profitably.

    Lanes pad to 128: tiny channel counts waste VMEM and bandwidth; the
    budget counts padded x block (bf16) + f32 scratch + out block (bf16)
    against ~12 MB usable VMEM.
    """
    if c < 64:
        return False
    pad = k // 2
    c_pad = ((c + 127) // 128) * 128
    x_bytes = (h + 2 * pad) * (w + 2 * pad) * c_pad * 2
    acc_bytes = h * w * c_pad * 4
    out_bytes = h * w * c_pad * 2
    return (x_bytes + acc_bytes + out_bytes) < 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv(x: jax.Array, w: jax.Array, k: int, interpret: bool = False):
    """Depthwise conv, stride 1, SAME. x [B,H,W,C], w [k,k,C] -> [B,H,W,C].

    Forward runs the Pallas kernel; backward delegates to XLA (exactly the
    gradients of the equivalent lax conv). Caller should gate on
    `pallas_viable` (see nn/blocks.py) — shapes outside the VMEM budget
    belong on the XLA path.
    """
    return _dw_forward(x, w, k, interpret)


def _dw_fwd(x, w, k, interpret):
    return _dw_forward(x, w, k, interpret), (x, w)


def _dw_bwd(k, interpret, res, g):
    x, w = res
    c = x.shape[-1]
    # dx: correlate g with spatially-flipped weights (still depthwise)
    w_flipped = w[::-1, ::-1, :]
    dx = _dw_xla(g, w_flipped).astype(x.dtype)
    # dw[ky, kx, c] = sum_{b,y,x} xpad[b, y+ky, x+kx, c] * g[b, y, x, c]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    dw = jnp.stack(
        [
            jnp.stack(
                [
                    (xp[:, ky : ky + h, kx : kx + wd, :] * g).sum((0, 1, 2))
                    for kx in range(k)
                ],
                axis=0,
            )
            for ky in range(k)
        ],
        axis=0,
    ).astype(w.dtype)
    return dx, dw


depthwise_conv.defvjp(_dw_fwd, _dw_bwd)
