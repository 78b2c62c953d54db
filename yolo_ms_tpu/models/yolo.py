"""YOLOv8 model family — backbone / PAFPN neck / decoupled anchor-free head.

Functional NHWC re-design of the reference model layer
(/root/reference/yolov8/{yolov8.py, model/yolov8_backbone.py,
model/yolov8_neck.py, model/yolov8_head.py}). Channel math and topology match
the reference exactly (so a converted .pt checkpoint is drop-in); the head
here ALWAYS returns the three raw per-scale maps — decode (anchors + DFL +
sigmoid) is a separate pure function in ``yolo_ms_tpu.models.decode``, which
avoids the reference's mutable ``head.stride`` footgun (yolov8_head.py:79)
and keeps the forward a single static-shape jittable graph.

Shapes (640x640 input, width w, ratio r):
  backbone: P3 [B,80,80,256w], P4 [B,40,40,512w], P5 [B,20,20,512wr]
            (yolov8_backbone.py:39-74)
  neck out: [B,80,80,256w], [B,40,40,512w], [B,20,20,512wr]
            (yolov8_neck.py:54-94)
  head raw: 3 x [B,H,W,4*reg_max + nc]   (yolov8_head.py:115-125)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ms_tpu.nn.blocks import (
    C2f,
    ConvBnSiLU,
    SPPF,
    deploy_mode_active,
    upsample2x,
    yolo_params,
)


class Backbone(nn.Module):
    """5 stride-2 convs + 4 C2f + SPPF (yolov8_backbone.py:30-74)."""

    version: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        depth, width, ratio = yolo_params(self.version)
        c64, c128 = int(64 * width), int(128 * width)
        c256, c512 = int(256 * width), int(512 * width)
        c512r = int(512 * width * ratio)
        d3, d6 = int(3 * depth), int(6 * depth)
        dt = self.dtype

        x = ConvBnSiLU(c64, 3, 2, dtype=dt, name="conv0")(x, train=train)
        x = ConvBnSiLU(c128, 3, 2, dtype=dt, name="conv1")(x, train=train)
        x = C2f(c128, d3, shortcut=True, dtype=dt, name="c2f_2")(x, train=train)
        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv3")(x, train=train)
        out1 = C2f(c256, d6, shortcut=True, dtype=dt, name="c2f_4")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv5")(out1, train=train)
        out2 = C2f(c512, d6, shortcut=True, dtype=dt, name="c2f_6")(x, train=train)
        x = ConvBnSiLU(c512r, 3, 2, dtype=dt, name="conv7")(out2, train=train)
        x = C2f(c512r, d3, shortcut=True, dtype=dt, name="c2f_8")(x, train=train)
        out3 = SPPF(c512r, 5, dtype=dt, name="sppf")(x, train=train)
        return out1, out2, out3


class Neck(nn.Module):
    """PAFPN: top-down FPN + bottom-up PAN (yolov8_neck.py:54-94)."""

    version: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, p3: jax.Array, p4: jax.Array, p5: jax.Array, *, train: bool = False
    ):
        depth, width, ratio = yolo_params(self.version)
        c256, c512 = int(256 * width), int(512 * width)
        c512r = int(512 * width * ratio)
        d3 = int(3 * depth)
        dt = self.dtype

        def up_cat(small, lateral):
            """Top-down fusion input. On the deploy graph the C2f 1x1 entry
            conv consumes (small, lateral) directly and contracts the
            upsampled slice at the SMALL resolution (exact — nearest x2
            commutes with 1x1 conv; nn.blocks._UpsampleConcatConv1x1), which
            skips materializing the [B,2H,2W,C] broadcast (0.52 ms at the
            80x80 site, bs=128 xprof)."""
            if deploy_mode_active():
                return (small, lateral)
            return jnp.concatenate([upsample2x(small), lateral], axis=-1)

        res_1 = p5
        x = up_cat(p5, p4)
        res_2 = C2f(c512, d3, shortcut=False, dtype=dt, name="c2f_1")(x, train=train)
        x = up_cat(res_2, p3)
        out1 = C2f(c256, d3, shortcut=False, dtype=dt, name="c2f_2")(x, train=train)

        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv1")(out1, train=train)
        x = jnp.concatenate([x, res_2], axis=-1)
        out2 = C2f(c512, d3, shortcut=False, dtype=dt, name="c2f_3")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv2")(out2, train=train)
        x = jnp.concatenate([x, res_1], axis=-1)
        out3 = C2f(c512r, d3, shortcut=False, dtype=dt, name="c2f_4")(x, train=train)
        return out1, out2, out3


class _HeadBranch(nn.Module):
    """Conv->Conv->1x1 conv(bias) branch (yolov8_head.py:83-110).

    The final conv bias is initialized to a detection prior (box: 1.0; cls:
    log(5/nc/grid_cells)) — the standard YOLO head initialization that keeps
    the initial cls loss near the background rate instead of exploding.
    """

    mid: int
    out: int
    bias_prior: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = ConvBnSiLU(self.mid, 3, dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvBnSiLU(self.mid, 3, dtype=self.dtype, name="conv2")(x, train=train)
        return nn.Conv(
            self.out,
            (1, 1),
            use_bias=True,
            bias_init=nn.initializers.constant(self.bias_prior),
            dtype=self.dtype,
            name="pred",
        )(x)


class DetectHead(nn.Module):
    """Decoupled anchor-free detection head (yolov8_head.py:72-125).

    Per scale: box branch ConvBnSiLU->ConvBnSiLU->Conv1x1(bias) to 4*reg_max
    channels; cls branch same shape to nc channels. Returns the 3 raw maps
    [B,H,W,4*reg_max+nc] — decode lives in models/decode.py.
    """

    version: str
    num_classes: int = 80
    reg_max: int = 16
    strides: Sequence[int] = (8, 16, 32)
    img_size: int = 640
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        *,
        train: bool = False,
        split: bool = False,
    ):
        import math

        coords = 4 * self.reg_max
        outs = []
        for i, f in enumerate(feats):
            # Prior biases: box distributions start near bin 1; class logits
            # start at ~5 objects per image over the level's grid cells.
            cls_prior = math.log(
                5 / self.num_classes / (self.img_size / self.strides[i]) ** 2
            )
            box = _HeadBranch(
                coords, coords, bias_prior=1.0, dtype=self.dtype, name=f"box_{i}"
            )(f, train=train)
            cls = _HeadBranch(
                self.num_classes,
                self.num_classes,
                bias_prior=cls_prior,
                dtype=self.dtype,
                name=f"cls_{i}",
            )(f, train=train)
            # split=True is the serving path: the tail consumes box/cls maps
            # separately, so the [B,H,W,4*reg_max+nc] channel-concat (a pure
            # ~0.9 ms HBM copy at bs=128, profile_e2e r3) is never built.
            outs.append((box, cls) if split else jnp.concatenate([box, cls], axis=-1))
        return tuple(outs)


# Public alias matching the reference's naming (yolov8_head.py:72).
Head = DetectHead


class YOLOv8(nn.Module):
    """Composition root: backbone -> neck -> head (yolov8.py:7-31).

    Always returns the tuple of 3 raw per-scale maps [B,H,W,4*reg_max+nc].
    Use ``models.decode.decode_predictions`` for the eval-mode [B,A,4+nc]
    tensor the reference emits (yolov8_head.py:127-144).
    """

    version: str
    num_classes: int = 80
    reg_max: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, split_head: bool = False):
        p3, p4, p5 = Backbone(self.version, dtype=self.dtype, name="backbone")(
            x, train=train
        )
        n1, n2, n3 = Neck(self.version, dtype=self.dtype, name="neck")(
            p3, p4, p5, train=train
        )
        return DetectHead(
            self.version,
            num_classes=self.num_classes,
            reg_max=self.reg_max,
            dtype=self.dtype,
            name="head",
        )((n1, n2, n3), train=train, split=split_head)
