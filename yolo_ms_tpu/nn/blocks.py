"""L1 primitive blocks — pure-functional flax.linen modules, NHWC layout.

TPU-first rebuild of the reference building blocks
(/root/reference/yolov8/model/components.py:69-209). Same math, different
design: NHWC tensors (lane dimension = channels, friendly to the 8x128 VPU /
128x128 MXU tiling), configurable compute dtype (bfloat16 on TPU), and pure
functions of a parameter pytree so everything composes under ``jax.jit`` /
``jax.grad`` / sharding.

Semantics pinned to the reference:
- ``ConvBnSiLU``  == Conv2d(bias=False) + BatchNorm2d(eps=1e-3, momentum=0.03)
  + SiLU (components.py:69-77). torch momentum 0.03 == flax momentum 0.97.
- ``C2f`` preserves the reference's *reverse-insert* concat order
  (components.py:118): [y_n, ..., y_1, x1, x2] along channels.
- ``SPPF`` = 1x1 reduce -> 3 chained 5x5/s1 maxpools -> concat -> 1x1
  (components.py:125-150).
- ``upsample2x`` nearest-neighbor pixel duplication (components.py:153-160).
- ``dfl_expectation`` softmax-expectation over reg_max bins — equivalent to the
  frozen arange conv in components.py:162-191, expressed as a fused
  softmax+dot that XLA maps onto the VPU/MXU directly.

MS-family blocks (MSBlock / MSSPPF / MSFusion) implement the YOLO-MS
architecture sketched in the reference docs (annotations.md:66-133,
model_zoos.md tables); the reference ships no code for them, so these follow
the published YOLO-MS design: hierarchical multi-branch blocks with inverted
depthwise bottlenecks and heterogeneous kernel sizes across stages.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

# Deploy mode: when this contextvar is True during trace/init, ConvBnSiLU
# builds conv(+bias)+SiLU with NO BatchNorm ops — the BN affine transform is
# expected to be pre-folded into the conv kernel/bias
# (models/deploy.py:fold_batchnorm). Serving rationale (PERF.md): with BN as
# separate ops, XLA's layout assignment puts the conv in batch-minor layout
# but the per-channel BN broadcasts in channel-minor layout, inserting a
# relayout copy on BOTH sides of every narrow-channel conv — measured 43%
# of the v8-n bs=32 forward. Folding removes the ops, so bias+SiLU fuse
# into the conv epilogue and the copies disappear.
import contextvars

_DEPLOY_MODE: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "yolo_ms_tpu_deploy_mode", default=False
)


class deploy_mode:
    """Context manager: trace model.apply under folded-BN deploy structure."""

    def __enter__(self):
        self._token = _DEPLOY_MODE.set(True)
        return self

    def __exit__(self, *exc):
        _DEPLOY_MODE.reset(self._token)
        return False


def deploy_mode_active() -> bool:
    """True while tracing under deploy_mode (folded-BN serving structure)."""
    return _DEPLOY_MODE.get()


# Depthwise fusion isolation: precede MS depthwise convs whose kernel size
# is >= this threshold with an optimization_barrier so XLA cannot fuse the
# 1x1 expand into the grouped-conv emitter (measured pathology — see
# InvertedBottleneck). 0 disables. Inference graphs only (train fusions
# differ and were not measured). Shipped default (3, "pre") is the best of
# the same-session sweep in benchmarks/dw_barrier_probe.py: yolo-ms-xs
# bs=128 deploy e2e steady-state 32.5 -> 28.6 ms (3,940 -> 4,471 img/s,
# bit-identical outputs); "both"-sided and higher thresholds all measured
# worse (30.2 / 29.4 / 29.9 ms).
_DW_ISOLATE: contextvars.ContextVar[int] = contextvars.ContextVar(
    "yolo_ms_tpu_dw_isolate", default=3
)
# "both" wraps the depthwise on each side; "pre" only breaks the
# expand->dw fusion and lets project fuse with the dw output.
_DW_ISOLATE_SIDES: contextvars.ContextVar[str] = contextvars.ContextVar(
    "yolo_ms_tpu_dw_isolate_sides", default="pre"
)


class dw_isolation:
    """Context manager: trace MS models with isolated depthwise convs.

    ``min_kernel`` is the smallest depthwise kernel size to isolate
    (0 = isolate none); ``sides`` is 'both' or 'pre'."""

    def __init__(self, min_kernel: int = 3, sides: str = "both"):
        self._min_kernel = min_kernel
        self._sides = sides

    def __enter__(self):
        self._token = _DW_ISOLATE.set(self._min_kernel)
        self._token_s = _DW_ISOLATE_SIDES.set(self._sides)
        return self

    def __exit__(self, *exc):
        _DW_ISOLATE.reset(self._token)
        _DW_ISOLATE_SIDES.reset(self._token_s)
        return False


# BatchNorm constants pinned to the reference (components.py:73).
BN_EPS = 1e-3
BN_MOMENTUM = 0.97  # flax decay == 1 - torch momentum (0.03)

# Probe-only (benchmarks/r5_bn_probe.py): freeze BN to running stats even
# under train=True, to MEASURE the attributable cost of train-mode batch
# statistics (the stats reduce + [C] stat writes). Semantically wrong for
# training — never enable outside the probe; read at trace time.
_PROBE_BN_FROZEN = False


def yolo_params(version: str) -> tuple[float, float, float]:
    """(depth, width, ratio) multipliers per model version.

    Mirrors the architecture table at components.py:193-209.
    """
    table = {
        "n": (1 / 3, 1 / 4, 2.0),
        "s": (1 / 3, 1 / 2, 2.0),
        "m": (2 / 3, 3 / 4, 1.5),
        "l": (1.0, 1.0, 1.0),
        "x": (1.0, 1.25, 1.0),
    }
    if version not in table:
        raise ValueError(f"Unknown YOLOv8 version: {version}")
    return table[version]


class _UpsampleConcatConv1x1(nn.Module):
    """1x1 conv over ``concat([upsample2x(a), b])`` that never materializes
    the upsampled map.

    A 1x1 stride-1 conv commutes with nearest-neighbor upsampling, so the
    kernel rows belonging to ``a`` can contract at the SMALL resolution (1/4
    the FLOPs) and only the ``features``-channel result is upsampled —
    replacing the [B,2H,2W,Ca] broadcast materialization that xprof showed
    costing 0.52 ms at the v8-n neck's 80x80 site (bs=128). Parameter layout
    is identical to nn.Conv ('kernel' [1,1,Ca+Cb,F] HWIO + optional 'bias'),
    so BN-folded deploy checkpoints are interchangeable; callers route here
    only under deploy_mode (the two partial sums add one bf16 rounding vs
    the single fused contraction).
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, ca + cb, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), k[:, :, :ca], (1, 1), "VALID",
            dimension_numbers=dn,
        )
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), k[:, :, ca:], (1, 1), "VALID",
            dimension_numbers=dn,
        )
        y = upsample2x(ya) + yb
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class _DepthwiseConv(nn.Module):
    """Stride-1 SAME depthwise conv with the same parameter layout as
    nn.Conv (kernel [k, k, 1, C] HWIO under 'kernel') so checkpoints are
    interchangeable.

    XLA's grouped-conv emitter is the production path: per-shape
    measurements on v5e (benchmarks/dw_probe.py, PERF.md) put it at
    3-13 TFLOP/s across every MS-family depthwise site, and a whole-image
    VMEM Pallas kernel measured 2-6x SLOWER at each of them (depthwise is
    VPU-FLOP-bound once resident; XLA's emitter reaches the MXU, a tap
    loop cannot)."""

    features: int
    kernel_size: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, c = self.kernel_size, self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, 1, c), jnp.float32
        )
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ConvBnSiLU(nn.Module):
    """Conv2d(bias=False) -> BatchNorm -> SiLU (optional identity activation).

    The universal primitive (components.py:69-77). NHWC; weights HWIO.
    XLA fuses the BN scale/shift and SiLU into the convolution epilogue, and
    at inference BN can be folded into the conv weights so the hot path is a
    single MXU op. Full-depthwise stride-1 convs go through _DepthwiseConv
    (XLA grouped conv — measured fastest, see PERF.md).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        pad = self.kernel_size // 2
        deploy = _DEPLOY_MODE.get()
        assert not (deploy and train), "deploy mode is inference-only"
        if isinstance(x, tuple):
            # (a_small, b): conv over concat([upsample2x(a_small), b]) with
            # the a-rows contracted at the small resolution (exact for a 1x1
            # stride-1 conv; see _UpsampleConcatConv1x1). Deploy-graph-only
            # calling convention — all callers gate on deploy_mode, so there
            # is no BN branch here.
            assert deploy, "split upsample-concat form is deploy-graph only"
            assert (
                self.kernel_size == 1 and self.stride == 1 and self.groups == 1
            ), "split upsample-concat form requires a plain 1x1 conv"
            a, b = x
            x = _UpsampleConcatConv1x1(
                self.features, use_bias=True, dtype=self.dtype, name="conv"
            )(a, b)
            if self.act:
                x = nn.silu(x)
            return x
        is_depthwise = (
            self.groups == self.features
            and self.groups == x.shape[-1]
            and self.stride == 1
        )
        if is_depthwise:
            x = _DepthwiseConv(
                self.features,
                self.kernel_size,
                use_bias=deploy,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.groups,
                use_bias=deploy,
                dtype=self.dtype,
                name="conv",
            )(x)
        if not deploy:
            x = nn.BatchNorm(
                use_running_average=(not train) or _PROBE_BN_FROZEN,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                axis_name=None,
                name="bn",
            )(x)
        if self.act:
            x = nn.silu(x)
        return x


class Bottleneck(nn.Module):
    """Two 3x3 ConvBnSiLU with optional residual add (components.py:80-93)."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype, name="conv2")(y, train=train)
        if self.shortcut:
            y = y + x
        return y


class C2f(nn.Module):
    """Cross-stage-partial block with 2 convolutions (components.py:96-122).

    1x1 conv -> split channels in half -> chain of bottlenecks on the first
    half, intermediate outputs concatenated in REVERSE-INSERT order
    [y_n, ..., y_1, x1, x2] to match components.py:118 exactly (this ordering
    matters for weight-parity with reference checkpoints) -> 1x1 conv out.
    """

    features: int
    num_bottlenecks: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        mid = self.features // 2
        x = ConvBnSiLU(self.features, 1, dtype=self.dtype, name="conv1")(x, train=train)
        x1, x2 = x[..., :mid], x[..., mid:]
        outputs = [x1, x2]
        for i in range(self.num_bottlenecks):
            x1 = Bottleneck(mid, shortcut=self.shortcut, dtype=self.dtype, name=f"m_{i}")(
                x1, train=train
            )
            outputs.insert(0, x1)
        y = jnp.concatenate(outputs, axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="conv2")(y, train=train)


def maxpool_same(x: jax.Array, window: int) -> jax.Array:
    """Stride-1 same-padded max pool via XLA reduce_window (MaxPool2d equiv).

    Replaces the delegated ATen MaxPool2d kernel (components.py:136) with the
    XLA-native reduce_window, which the TPU backend lowers to fused VPU code.
    """
    pad = window // 2
    neg_inf = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    )
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): components.py:125-150."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        hidden = x.shape[-1] // 2
        x = ConvBnSiLU(hidden, 1, dtype=self.dtype, name="conv1")(x, train=train)
        x1 = maxpool_same(x, self.kernel_size)
        x2 = maxpool_same(x1, self.kernel_size)
        x3 = maxpool_same(x2, self.kernel_size)
        y = jnp.concatenate([x, x1, x2, x3], axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="conv2")(y, train=train)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, NHWC (components.py:153-160 equivalent).

    Pure reshape/broadcast — zero FLOPs, no gather; XLA lowers this to a
    layout change that usually fuses with the consumer.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def dfl_expectation(dist: jax.Array) -> jax.Array:
    """Distribution -> coordinate expectation (components.py:162-191).

    dist: [..., 4, reg_max] logits over bins for each of the 4 ltrb sides.
    Returns [..., 4] f32: softmax expectation sum_i(i * p_i). This replaces
    the reference's frozen arange-weighted 1x1 conv.

    TPU-layout note: the obvious ``softmax(dist, -1) @ arange`` runs every
    pass over a reg_max(=16)-wide trailing axis — 1/8 lane utilization on the
    128-wide VPU, and XLA materializes padded intermediates (measured
    ~3.3 ms extra at [128, 8400, 4, 16] on v5e). Instead the last two dims
    are flattened back to the lane-friendly 4*reg_max axis (XLA cancels the
    reshape against the caller's) and the per-side softmax + expectation
    become a single [4*reg_max, 8] matmul:

        e   = exp(x - rowmax)          # [..., 4*reg_max], full-lane
        out = e @ [W | S]              # [..., 8] = numerators | denominators
        exp_i = out[..., i] / out[..., 4+i]

    with W[j, i] = (j % reg_max) * [j // reg_max == i] and
    S[j, i] = [j // reg_max == i]. The shift is the row max over all
    4*reg_max logits (softmax is shift-invariant per side); the diff is
    clamped at -60 so a whole side cannot underflow to 0/0 (distortion only
    for >60-logit gaps between sides, far beyond trained DFL ranges).
    """
    *lead, k, reg_max = dist.shape
    x = dist.astype(jnp.float32).reshape(*lead, k * reg_max)
    c = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(jnp.maximum(x - c, -60.0))
    idx = jnp.arange(k * reg_max)
    seg = (idx[:, None] // reg_max == jnp.arange(k)[None, :]).astype(jnp.float32)
    rhs = jnp.concatenate([seg * (idx % reg_max)[:, None], seg], axis=1)
    # HIGHEST: e values span many binades; bf16-rounded operands (the TPU
    # f32-matmul default) would cost ~0.4% relative error -> up to ~2 px at
    # stride 32. Contraction is only 4*reg_max wide, so the cost is nil.
    out = jnp.einsum(
        "...i,ij->...j", e, rhs, precision=jax.lax.Precision.HIGHEST
    )
    return out[..., :k] / out[..., k:]


# --------------------------------------------------------------------------
# YOLO-MS family blocks (annotations.md:66-133; no reference code exists —
# implemented from the published YOLO-MS design).
# --------------------------------------------------------------------------


class SqueezeExcite(nn.Module):
    """Squeeze-and-excitation channel attention — the zoo's ``*`` variants.

    The model-zoo tables list SE-augmented YOLO-MS models
    (model_zoos.md:93-125: "YOLO-MS-XS*/S* ... SE attention"); no reference
    code exists, so this is the standard SE design: global-average squeeze ->
    1x1 reduce (SiLU) -> 1x1 expand -> sigmoid channel gate. Plain biased
    convs (no BN) so deploy-mode BN folding passes through unchanged, and the
    [B,1,1,C] bottleneck keeps the whole module a few-microsecond epilogue.
    """

    features: int
    ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = max(8, int(self.features * self.ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(hidden, (1, 1), use_bias=True, dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype, name="expand"
        )(s)
        return x * jax.nn.sigmoid(s)


class InvertedBottleneck(nn.Module):
    """1x1 expand -> kxk depthwise -> (optional SE) -> 1x1 project.

    ``isolate_dw=False`` opts the module out of the dw-isolation barriers
    regardless of the ambient context: the barrier win is family-specific
    (yolo-ms-xs +13%; yolov8-ms-n −5% — its wider hidden widths sit in the
    opposite fusion regime, same-session A/B in PERF.md), so each
    composition root picks its measured-best setting.
    """

    features: int
    kernel_size: int
    expansion: float = 2.0
    use_se: bool = False
    isolate_dw: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        hidden = int(self.features * self.expansion)
        y = ConvBnSiLU(hidden, 1, dtype=self.dtype, name="expand")(x, train=train)
        isolate = (
            self.isolate_dw
            and (not train)
            and 0 < _DW_ISOLATE.get() <= self.kernel_size
        )
        if isolate:
            # Break the expand->depthwise fusion: XLA fuses the 1x1 expand
            # into the grouped-conv emitter and the fused op runs ~4-5x
            # slower than the two ops separately (in-graph 1.0 ms vs 0.25 ms
            # isolated at k7@[128,40,40,128] — xprof r3 vs dw census;
            # whole-model A/B in benchmarks/dw_barrier_probe.py).
            y = jax.lax.optimization_barrier(y)
        y = ConvBnSiLU(
            hidden, self.kernel_size, groups=hidden, dtype=self.dtype, name="dw"
        )(y, train=train)
        if isolate and _DW_ISOLATE_SIDES.get() == "both":
            y = jax.lax.optimization_barrier(y)
        if self.use_se:
            y = SqueezeExcite(hidden, dtype=self.dtype, name="se")(y)
        y = ConvBnSiLU(self.features, 1, dtype=self.dtype, name="project")(y, train=train)
        return y


class MSBlock(nn.Module):
    """Multi-scale block — hierarchical branch aggregation (YOLO-MS).

    in 1x1 conv -> split into ``num_branches`` channel groups; group 0 passes
    through, each later group goes through an inverted depthwise bottleneck
    after adding the previous branch output (Res2Net-style progressive
    receptive field growth) -> concat -> out 1x1 conv. Kernel size is chosen
    per stage (heterogeneous-kernel-size protocol: small kernels shallow,
    large kernels deep). Replaces C2f in the MS backbone/neck
    (annotations.md:76-115).
    """

    features: int
    kernel_size: int = 3
    num_branches: int = 3
    branch_ratio: float = 1.0
    expansion: float = 2.0
    use_se: bool = False
    isolate_dw: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        bc = max(8, int(self.features * self.branch_ratio / self.num_branches))
        x = ConvBnSiLU(bc * self.num_branches, 1, dtype=self.dtype, name="in_conv")(
            x, train=train
        )
        chunks = [
            x[..., i * bc : (i + 1) * bc] for i in range(self.num_branches)
        ]
        outs = [chunks[0]]
        prev = chunks[0]
        for i in range(1, self.num_branches):
            y = chunks[i] + prev
            y = InvertedBottleneck(
                bc,
                kernel_size=self.kernel_size,
                expansion=self.expansion,
                use_se=self.use_se,
                isolate_dw=self.isolate_dw,
                dtype=self.dtype,
                name=f"branch_{i}",
            )(y, train=train)
            outs.append(y)
            prev = y
        y = jnp.concatenate(outs, axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="out_conv")(
            y, train=train
        )


class MSSPPF(nn.Module):
    """MS-flavoured SPPF: pooling pyramid with depthwise pre-mixing.

    The reference only names MS-SPPF in its comparison diagram
    (annotations.md:84); implemented as SPPF with a depthwise kxk mixer ahead
    of the pooling chain, keeping the same pyramid semantics.
    """

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        hidden = x.shape[-1] // 2
        x = ConvBnSiLU(hidden, 1, dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvBnSiLU(hidden, 3, groups=hidden, dtype=self.dtype, name="dw")(
            x, train=train
        )
        x1 = maxpool_same(x, self.kernel_size)
        x2 = maxpool_same(x1, self.kernel_size)
        x3 = maxpool_same(x2, self.kernel_size)
        y = jnp.concatenate([x, x1, x2, x3], axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="conv2")(y, train=train)


class MSFusion(nn.Module):
    """Feature-map fusion for the MS neck (annotations.md:95-113).

    Concatenates two maps along channels and mixes them with a 1x1 conv —
    the MS replacement for the plain concat in the v8 PAFPN.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        a: jax.Array,
        b: jax.Array,
        *,
        train: bool = False,
        upsample_a: bool = False,
    ) -> jax.Array:
        """With ``upsample_a``, `a` arrives at half resolution and is
        nearest-2x upsampled before the concat; on the deploy graph the fuse
        conv instead consumes (a, b) split so the a-rows contract at the
        small resolution (exact — see _UpsampleConcatConv1x1)."""
        if upsample_a and _DEPLOY_MODE.get():
            return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="fuse")(
                (a, b), train=train
            )
        if upsample_a:
            a = upsample2x(a)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="fuse")(y, train=train)
