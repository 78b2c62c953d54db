"""Anchor generation + DFL box decode — pure jittable functions.

Re-design of the reference head's eval path (yolov8_head.py:127-158). The
reference mutates ``head.stride`` state and branches on ``self.training``;
here anchors are compile-time constants derived from the static feature-map
shapes, and decode is a standalone function so the same raw head maps serve
training loss and inference decode.

Output contract matches the reference eval output: [B, A, 4+nc] where the
first 4 channels are (cx, cy, w, h) in input-image pixels and the class
channels are sigmoid scores (yolov8_head.py:130-144).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from yolo_ms_tpu.nn.blocks import dfl_expectation

DEFAULT_STRIDES: tuple[int, ...] = (8, 16, 32)


def make_anchors(
    shapes: Sequence[tuple[int, int]],
    strides: Sequence[int] = DEFAULT_STRIDES,
    offset: float = 0.5,
    dtype: jnp.dtype = jnp.float32,
):
    """Grid-center anchor points + per-anchor strides.

    Mirrors yolov8_head.py:146-158: per level, anchor centers are
    (x+0.5, y+0.5) in grid units, flattened row-major, concatenated over
    levels. Returns (anchors [A,2], strides [A,1]).
    """
    anchor_list, stride_list = [], []
    for (h, w), s in zip(shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + offset
        sy = jnp.arange(h, dtype=dtype) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_list.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_list.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(anchor_list), jnp.concatenate(stride_list)


def flatten_maps(
    raw_maps: Sequence[jax.Array], num_classes: int, reg_max: int = 16
):
    """Flatten per-scale NHWC raw maps to (box_dist [B,A,4,reg_max], cls [B,A,nc]).

    Equivalent to the reshape/concat/split at yolov8_head.py:130-135, in NHWC.
    """
    no = 4 * reg_max + num_classes
    flat = []
    for m in raw_maps:
        b, h, w, c = m.shape
        assert c == no, f"expected {no} channels, got {c}"
        flat.append(m.reshape(b, h * w, c))
    x = jnp.concatenate(flat, axis=1)  # [B, A, no]
    box_dist = x[..., : 4 * reg_max].reshape(x.shape[0], x.shape[1], 4, reg_max)
    cls = x[..., 4 * reg_max :]
    return box_dist, cls


def decode_boxes(
    box_dist: jax.Array, anchors: jax.Array, strides: jax.Array
) -> jax.Array:
    """DFL distributions -> (cx, cy, w, h) boxes in input pixels.

    box_dist: [B, A, 4, reg_max] raw logits in ltrb order.
    Matches yolov8_head.py:138-143: expectation -> lt/rb -> x1y1 = anchor-lt,
    x2y2 = anchor+rb -> center/size -> scale by stride.
    """
    ltrb = dfl_expectation(box_dist)  # [B, A, 4]
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    c = (x1y1 + x2y2) / 2.0
    wh = x2y2 - x1y1
    return jnp.concatenate([c, wh], axis=-1) * strides[None]


def decode_predictions(
    raw_maps: Sequence[jax.Array],
    num_classes: int,
    reg_max: int = 16,
    strides: Sequence[int] = DEFAULT_STRIDES,
) -> jax.Array:
    """Full eval-mode decode: raw maps -> [B, A, 4+nc] (reference parity).

    The eval output contract of yolov8_head.py:115-144: boxes (cx,cy,w,h) in
    pixels followed by per-class sigmoid scores.

    Box math always runs in f32 regardless of the model compute dtype:
    bf16 has 8 mantissa bits, so decoding at 640-px scale in bf16 quantizes
    coordinates by ~2.5 px. The [B, A, .] decode tail is cheap relative to
    the conv stack, so the f32 cast costs nothing measurable.
    """
    shapes = [(m.shape[1], m.shape[2]) for m in raw_maps]
    anchors, stride_t = make_anchors(shapes, strides, dtype=jnp.float32)
    box_dist, cls = flatten_maps(
        [m.astype(jnp.float32) for m in raw_maps], num_classes, reg_max
    )
    boxes = decode_boxes(box_dist, anchors, stride_t)
    return jnp.concatenate([boxes, jax.nn.sigmoid(cls)], axis=-1)


def decode_boxes_xyxy(
    box_dist: jax.Array, anchors: jax.Array, strides: jax.Array
) -> jax.Array:
    """Same as decode_boxes but returns (x1, y1, x2, y2) — used by the loss."""
    ltrb = dfl_expectation(box_dist)
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1) * strides[None]
