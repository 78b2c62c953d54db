"""YOLO-MS model family (XS / S / M) — multi-scale building-block detector.

The reference repo documents but does not implement YOLO-MS (the ASCII
architecture comparison at annotations.md:66-133 and the model-zoo tables at
model_zoos.md:20-61 are the only traces). This module supplies the capability:
the v8 skeleton with C2f replaced by MSBlock (hierarchical multi-branch with
inverted depthwise bottlenecks), SPPF replaced by MS-SPPF, and neck concats
replaced by MSFusion, following the published YOLO-MS design including the
heterogeneous-kernel-size (HKS) protocol — small kernels in shallow stages,
large kernels deep: k = 3, 5, 7, 9 across backbone stages.

Same head / decode / loss contract as YOLOv8 (3 raw maps, strides 8/16/32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_ms_tpu.nn.blocks import ConvBnSiLU, MSBlock, MSFusion, MSSPPF
from yolo_ms_tpu.models.yolo import DetectHead

# (depth, width, ratio) per YOLO-MS variant; widths calibrated so parameter
# counts land near the model-zoo table (model_zoos.md:20-61: XS 4.5-5.1M,
# S 8.1-8.7M, M 22-23.3M).
MS_PARAMS: dict[str, tuple[float, float, float]] = {
    "xs": (1 / 3, 0.375, 2.0),
    "s": (1 / 3, 0.53, 2.0),
    "m": (2 / 3, 0.9, 1.5),
}

# HKS protocol: kernel size per backbone stage (shallow -> deep).
HKS_KERNELS: tuple[int, ...] = (3, 5, 7, 9)
# Neck kernels per feature stride (8, 16, 32). Round 2 shipped a uniform
# k=7 neck, which broke the HKS protocol at stride 8 AND hit the one
# measured-slow XLA depthwise emitter shape on v5e (k7@[B,80,80,64]:
# ~3.2 TFLOP/s vs 6-13 for every other site; 2 reformulations + an H-split
# probed worse, PERF.md). Aligning the neck to the backbone's
# scale-matched kernels (5 at stride 8, 7 at 16, 9 at 32) removes that
# shape entirely — kernel choices are this repo's own to make (the
# reference only documents YOLO-MS, annotations.md:66-133); the A/B on the
# synthetic learning recipe is in PERF.md.
NECK_KERNELS: tuple[int, int, int] = (5, 7, 9)


def ms_params(version: str) -> tuple[float, float, float]:
    if version not in MS_PARAMS:
        raise ValueError(f"Unknown YOLO-MS version: {version} (xs/s/m)")
    return MS_PARAMS[version]


class _MSStage(nn.Module):
    """max(1, round(3*depth)) chained MSBlocks with a stage-specific kernel."""

    features: int
    kernel_size: int
    depth: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        n = max(1, round(3 * self.depth))
        for i in range(n):
            x = MSBlock(
                self.features,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train)
        return x


class MSBackbone(nn.Module):
    """5 stride-2 convs + 4 MSBlock stages (HKS kernels) + MS-SPPF.

    Topology mirrors the v8 backbone (yolov8_backbone.py:30-74) with MS
    blocks, per annotations.md:76-85.
    """

    version: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        depth, width, ratio = ms_params(self.version)
        c64, c128 = int(64 * width), int(128 * width)
        c256, c512 = int(256 * width), int(512 * width)
        c512r = int(512 * width * ratio)
        dt = self.dtype
        k1, k2, k3, k4 = HKS_KERNELS

        x = ConvBnSiLU(c64, 3, 2, dtype=dt, name="conv0")(x, train=train)
        x = ConvBnSiLU(c128, 3, 2, dtype=dt, name="conv1")(x, train=train)
        x = _MSStage(c128, k1, depth, dtype=dt, name="stage_2")(x, train=train)
        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv3")(x, train=train)
        out1 = _MSStage(c256, k2, depth, dtype=dt, name="stage_4")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv5")(out1, train=train)
        out2 = _MSStage(c512, k3, depth, dtype=dt, name="stage_6")(x, train=train)
        x = ConvBnSiLU(c512r, 3, 2, dtype=dt, name="conv7")(out2, train=train)
        x = _MSStage(c512r, k4, depth, dtype=dt, name="stage_8")(x, train=train)
        out3 = MSSPPF(c512r, 5, dtype=dt, name="ms_sppf")(x, train=train)
        return out1, out2, out3


class MSNeck(nn.Module):
    """PAFPN with MSFusion + MSBlock (annotations.md:91-116).

    Each neck stage uses the kernel size matched to its feature stride
    (``neck_kernels``, default NECK_KERNELS) — the HKS protocol applied to
    the neck, and the removal of the slow k7@stride-8 depthwise shape.
    """

    version: str
    dtype: jnp.dtype = jnp.float32
    neck_kernels: tuple[int, int, int] | None = None

    @nn.compact
    def __call__(
        self, p3: jax.Array, p4: jax.Array, p5: jax.Array, *, train: bool = False
    ):
        depth, width, ratio = ms_params(self.version)
        c256, c512 = int(256 * width), int(512 * width)
        c512r = int(512 * width * ratio)
        dt = self.dtype
        k8, k16, k32 = self.neck_kernels or NECK_KERNELS

        res_1 = p5
        x = MSFusion(c512, dtype=dt, name="fuse_1")(
            p5, p4, train=train, upsample_a=True
        )
        res_2 = _MSStage(c512, k16, depth, dtype=dt, name="stage_1")(x, train=train)
        x = MSFusion(c256, dtype=dt, name="fuse_2")(
            res_2, p3, train=train, upsample_a=True
        )
        out1 = _MSStage(c256, k8, depth, dtype=dt, name="stage_2")(x, train=train)

        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv1")(out1, train=train)
        x = MSFusion(c512, dtype=dt, name="fuse_3")(x, res_2, train=train)
        out2 = _MSStage(c512, k16, depth, dtype=dt, name="stage_3")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv2")(out2, train=train)
        x = MSFusion(c512r, dtype=dt, name="fuse_4")(x, res_1, train=train)
        out3 = _MSStage(c512r, k32, depth, dtype=dt, name="stage_4")(x, train=train)
        return out1, out2, out3


class YOLOMS(nn.Module):
    """YOLO-MS composition root: MS backbone -> MS neck -> v8 detect head."""

    version: str
    num_classes: int = 80
    reg_max: int = 16
    dtype: jnp.dtype = jnp.float32
    neck_kernels: tuple[int, int, int] | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, split_head: bool = False):
        p3, p4, p5 = MSBackbone(self.version, dtype=self.dtype, name="backbone")(
            x, train=train
        )
        n1, n2, n3 = MSNeck(
            self.version,
            dtype=self.dtype,
            neck_kernels=self.neck_kernels,
            name="neck",
        )(p3, p4, p5, train=train)
        # Head width multipliers follow the v8 head contract; reuse the same
        # decoupled head with the closest v8 width for channel sizing.
        head_version = {"xs": "n", "s": "s", "m": "m"}[self.version]
        return DetectHead(
            head_version,
            num_classes=self.num_classes,
            reg_max=self.reg_max,
            dtype=self.dtype,
            name="head",
        )((n1, n2, n3), train=train, split=split_head)
