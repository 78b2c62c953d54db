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

from yolo_ms_tpu.nn.blocks import (
    SPPF,
    ConvBnSiLU,
    MSBlock,
    MSFusion,
    MSSPPF,
    deploy_mode_active,
    upsample2x,
    yolo_params,
)
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
    """Chained MSBlocks with a stage-specific kernel.

    Block count defaults to max(1, round(3*depth)); ``num_blocks`` overrides
    it (the YOLOv8-MS family mirrors the v8 per-stage depth schedule
    3d/6d/6d/3d instead, yolov8_backbone.py:46-49).
    """

    features: int
    kernel_size: int
    depth: float
    num_blocks: int | None = None
    use_se: bool = False
    branch_ratio: float = 1.0
    expansion: float = 2.0
    isolate_dw: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        n = self.num_blocks if self.num_blocks else max(1, round(3 * self.depth))
        for i in range(n):
            x = MSBlock(
                self.features,
                kernel_size=self.kernel_size,
                use_se=self.use_se,
                branch_ratio=self.branch_ratio,
                expansion=self.expansion,
                isolate_dw=self.isolate_dw,
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
    use_se: bool = False
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
        x = _MSStage(c128, k1, depth, use_se=self.use_se, dtype=dt, name="stage_2")(x, train=train)
        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv3")(x, train=train)
        out1 = _MSStage(c256, k2, depth, use_se=self.use_se, dtype=dt, name="stage_4")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv5")(out1, train=train)
        out2 = _MSStage(c512, k3, depth, use_se=self.use_se, dtype=dt, name="stage_6")(x, train=train)
        x = ConvBnSiLU(c512r, 3, 2, dtype=dt, name="conv7")(out2, train=train)
        x = _MSStage(c512r, k4, depth, use_se=self.use_se, dtype=dt, name="stage_8")(x, train=train)
        out3 = MSSPPF(c512r, 5, dtype=dt, name="ms_sppf")(x, train=train)
        return out1, out2, out3


class MSNeck(nn.Module):
    """PAFPN with MSFusion + MSBlock (annotations.md:91-116).

    Each neck stage uses the kernel size matched to its feature stride
    (``neck_kernels``, default NECK_KERNELS) — the HKS protocol applied to
    the neck, and the removal of the slow k7@stride-8 depthwise shape.
    """

    version: str
    use_se: bool = False
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
        res_2 = _MSStage(c512, k16, depth, use_se=self.use_se, dtype=dt, name="stage_1")(x, train=train)
        x = MSFusion(c256, dtype=dt, name="fuse_2")(
            res_2, p3, train=train, upsample_a=True
        )
        out1 = _MSStage(c256, k8, depth, use_se=self.use_se, dtype=dt, name="stage_2")(x, train=train)

        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv1")(out1, train=train)
        x = MSFusion(c512, dtype=dt, name="fuse_3")(x, res_2, train=train)
        out2 = _MSStage(c512, k16, depth, use_se=self.use_se, dtype=dt, name="stage_3")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv2")(out2, train=train)
        x = MSFusion(c512r, dtype=dt, name="fuse_4")(x, res_1, train=train)
        out3 = _MSStage(c512r, k32, depth, use_se=self.use_se, dtype=dt, name="stage_4")(x, train=train)
        return out1, out2, out3


class YOLOMS(nn.Module):
    """YOLO-MS composition root: MS backbone -> MS neck -> v8 detect head."""

    version: str
    num_classes: int = 80
    reg_max: int = 16
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32
    neck_kernels: tuple[int, int, int] | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, split_head: bool = False):
        p3, p4, p5 = MSBackbone(
            self.version, use_se=self.use_se, dtype=self.dtype, name="backbone"
        )(x, train=train)
        n1, n2, n3 = MSNeck(
            self.version,
            use_se=self.use_se,
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


# --------------------------------------------------------------------------
# YOLOv8-MS family — MS-Block applied to the YOLOv8 macro-architecture
# (model_zoos.md:168-209: "Applying MS-Block to YOLOv8"; N/S/M rows with
# 2.9M / 9.5M / 25.9M params). No reference code exists; the design follows
# the published recipe: keep the v8 skeleton (stride convs, SPPF, plain
# PAFPN concats, per-stage depth schedule 3d/6d/6d/3d) and swap every C2f
# stage for MSBlocks under the HKS kernel protocol.
# --------------------------------------------------------------------------


# MSBlock width knobs per YOLOv8-MS version, calibrated so parameter counts
# land on the model-zoo rows (model_zoos.md:168-209: N 2.9M, S 9.5M, M 25.9M):
# (branch_ratio, expansion) of every MS stage in backbone+neck.
V8MS_BLOCK: dict[str, tuple[float, float]] = {
    "n": (1.25, 3.0),  # 2.89M vs zoo 2.9M
    "s": (1.5, 2.0),  # 9.46M vs zoo 9.5M
    "m": (1.5, 3.0),  # 25.76M vs zoo 25.9M
}


class V8MSBackbone(nn.Module):
    """v8 backbone (yolov8_backbone.py:30-74) with MSBlock stages + SPPF."""

    version: str
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        depth, width, ratio = yolo_params(self.version)
        c64, c128 = int(64 * width), int(128 * width)
        c256, c512 = int(256 * width), int(512 * width)
        c512r = int(512 * width * ratio)
        d3, d6 = max(1, int(3 * depth)), max(1, int(6 * depth))
        dt = self.dtype
        k1, k2, k3, k4 = HKS_KERNELS

        br, ex = V8MS_BLOCK[self.version]

        def stage(feats, k, n, name):
            # isolate_dw=False: barriers measured 5% WORSE on this family
            # (PERF.md "dw-isolation is family-specific")
            return _MSStage(
                feats, k, depth, num_blocks=n, use_se=self.use_se,
                branch_ratio=br, expansion=ex, isolate_dw=False,
                dtype=dt, name=name
            )

        x = ConvBnSiLU(c64, 3, 2, dtype=dt, name="conv0")(x, train=train)
        x = ConvBnSiLU(c128, 3, 2, dtype=dt, name="conv1")(x, train=train)
        x = stage(c128, k1, d3, "stage_2")(x, train=train)
        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv3")(x, train=train)
        out1 = stage(c256, k2, d6, "stage_4")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv5")(out1, train=train)
        out2 = stage(c512, k3, d6, "stage_6")(x, train=train)
        x = ConvBnSiLU(c512r, 3, 2, dtype=dt, name="conv7")(out2, train=train)
        x = stage(c512r, k4, d3, "stage_8")(x, train=train)
        out3 = SPPF(c512r, 5, dtype=dt, name="sppf")(x, train=train)
        return out1, out2, out3


class V8MSNeck(nn.Module):
    """v8 PAFPN (yolov8_neck.py:54-94) with MSBlock stages.

    Fusion stays the v8 plain concat; stage kernels follow the feature
    stride (NECK_KERNELS — same HKS reasoning as MSNeck). On the deploy
    graph the top-down fusions feed the MSBlock entry 1x1 conv the
    (small, lateral) split form, so the nearest-2x broadcast is never
    materialized (exact; nn.blocks._UpsampleConcatConv1x1).
    """

    version: str
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, p3: jax.Array, p4: jax.Array, p5: jax.Array, *, train: bool = False
    ):
        depth, width, ratio = yolo_params(self.version)
        c256, c512 = int(256 * width), int(512 * width)
        c512r = int(512 * width * ratio)
        d3 = max(1, int(3 * depth))
        dt = self.dtype
        k8, k16, k32 = NECK_KERNELS

        br, ex = V8MS_BLOCK[self.version]

        def stage(feats, k, name):
            return _MSStage(
                feats, k, depth, num_blocks=d3, use_se=self.use_se,
                branch_ratio=br, expansion=ex, isolate_dw=False,
                dtype=dt, name=name
            )

        def up_cat(small, lateral):
            if deploy_mode_active():
                return (small, lateral)
            return jnp.concatenate([upsample2x(small), lateral], axis=-1)

        res_1 = p5
        x = up_cat(p5, p4)
        res_2 = stage(c512, k16, "stage_1")(x, train=train)
        x = up_cat(res_2, p3)
        out1 = stage(c256, k8, "stage_2")(x, train=train)

        x = ConvBnSiLU(c256, 3, 2, dtype=dt, name="conv1")(out1, train=train)
        x = jnp.concatenate([x, res_2], axis=-1)
        out2 = stage(c512, k16, "stage_3")(x, train=train)
        x = ConvBnSiLU(c512, 3, 2, dtype=dt, name="conv2")(out2, train=train)
        x = jnp.concatenate([x, res_1], axis=-1)
        out3 = stage(c512r, k32, "stage_4")(x, train=train)
        return out1, out2, out3


class YOLOv8MS(nn.Module):
    """YOLOv8-MS composition root: v8 skeleton, MSBlock stages, v8 head."""

    version: str
    num_classes: int = 80
    reg_max: int = 16
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, split_head: bool = False):
        p3, p4, p5 = V8MSBackbone(
            self.version, use_se=self.use_se, dtype=self.dtype, name="backbone"
        )(x, train=train)
        n1, n2, n3 = V8MSNeck(
            self.version, use_se=self.use_se, dtype=self.dtype, name="neck"
        )(p3, p4, p5, train=train)
        return DetectHead(
            self.version,
            num_classes=self.num_classes,
            reg_max=self.reg_max,
            dtype=self.dtype,
            name="head",
        )((n1, n2, n3), train=train, split=split_head)
