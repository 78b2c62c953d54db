"""Unit tests for L1 primitive blocks: numerics vs torch functional ops.

The oracles are built from torch.nn.functional primitives (conv2d,
batch_norm, silu, max_pool2d, interpolate, softmax) composed per the
documented reference semantics — not from the reference source.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from yolo_ms_tpu.nn.blocks import (
    BN_EPS,
    Bottleneck,
    C2f,
    ConvBnSiLU,
    MSBlock,
    SPPF,
    dfl_expectation,
    maxpool_same,
    upsample2x,
    yolo_params,
)

RTOL, ATOL = 1e-4, 1e-4


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def torch_conv_bn_silu(x, w_hwio, gamma, beta, mean, var, stride=1, act=True, groups=1):
    """Oracle: Conv2d(bias=False) + BatchNorm(eval, eps=1e-3) + SiLU."""
    w = torch.from_numpy(np.transpose(w_hwio, (3, 2, 0, 1)).copy())  # OIHW
    k = w_hwio.shape[0]
    y = F.conv2d(x, w, stride=stride, padding=k // 2, groups=groups)
    y = F.batch_norm(
        y,
        torch.from_numpy(mean),
        torch.from_numpy(var),
        torch.from_numpy(gamma),
        torch.from_numpy(beta),
        training=False,
        eps=BN_EPS,
    )
    return F.silu(y) if act else y


class TestConvBnSiLU:
    @pytest.mark.parametrize("stride,k,act", [(1, 3, True), (2, 3, True), (1, 1, False)])
    def test_matches_torch(self, stride, k, act):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 16, 8), dtype=np.float32)
        mod = ConvBnSiLU(12, kernel_size=k, stride=stride, act=act)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        # Randomize BN stats so the test is not trivially identity.
        bs = variables["batch_stats"]["bn"]
        bs = {
            "mean": jnp.asarray(rng.standard_normal(12, dtype=np.float32) * 0.1),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, 12).astype(np.float32)),
        }
        params = variables["params"]
        params["bn"]["scale"] = jnp.asarray(rng.uniform(0.5, 1.5, 12).astype(np.float32))
        params["bn"]["bias"] = jnp.asarray(rng.standard_normal(12, dtype=np.float32) * 0.1)
        variables = {"params": params, "batch_stats": {"bn": bs}}

        y = mod.apply(variables, jnp.asarray(x), train=False)

        ref = torch_conv_bn_silu(
            nchw(x),
            np.asarray(params["conv"]["kernel"]),
            np.asarray(params["bn"]["scale"]),
            np.asarray(params["bn"]["bias"]),
            np.asarray(bs["mean"]),
            np.asarray(bs["var"]),
            stride=stride,
            act=act,
        )
        np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), rtol=RTOL, atol=ATOL)

    def test_batch_stats_update(self):
        """Training mode updates running stats with torch momentum 0.03."""
        x = np.random.default_rng(1).standard_normal((4, 8, 8, 4), dtype=np.float32)
        mod = ConvBnSiLU(6)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        y, updates = mod.apply(
            variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        new_mean = np.asarray(updates["batch_stats"]["bn"]["mean"])
        # initial mean is 0; new = 0.97*0 + 0.03*batch_mean
        assert not np.allclose(new_mean, 0.0)


class TestMaxPoolUpsample:
    def test_maxpool_same_matches_torch(self):
        x = np.random.default_rng(2).standard_normal((1, 9, 9, 3), dtype=np.float32)
        y = maxpool_same(jnp.asarray(x), 5)
        ref = F.max_pool2d(nchw(x), kernel_size=5, stride=1, padding=2)
        np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), rtol=RTOL, atol=ATOL)

    def test_upsample2x_matches_torch_nearest(self):
        x = np.random.default_rng(3).standard_normal((2, 5, 7, 4), dtype=np.float32)
        y = upsample2x(jnp.asarray(x))
        ref = F.interpolate(nchw(x), scale_factor=2, mode="nearest")
        np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), rtol=RTOL, atol=ATOL)


class TestDFL:
    def test_expectation_matches_softmax_arange(self):
        """DFL == softmax over bins then expectation with arange weights
        (components.py:162-191 semantics)."""
        rng = np.random.default_rng(4)
        dist = rng.standard_normal((2, 10, 4, 16), dtype=np.float32)
        got = dfl_expectation(jnp.asarray(dist))
        t = torch.from_numpy(dist)
        probs = torch.softmax(t, dim=-1)
        ref = (probs * torch.arange(16, dtype=torch.float32)).sum(-1)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=RTOL, atol=ATOL)

    def test_range(self):
        dist = jnp.zeros((1, 3, 4, 16))
        out = dfl_expectation(dist)
        np.testing.assert_allclose(np.asarray(out), 7.5)  # uniform -> mean bin


class TestBlocks:
    def test_bottleneck_residual(self):
        """shortcut=True adds the input (components.py:91-92)."""
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((1, 8, 8, 6), dtype=np.float32)
        )
        mod_s = Bottleneck(6, shortcut=True)
        v = mod_s.init(jax.random.PRNGKey(0), x, train=False)
        y_s = mod_s.apply(v, x, train=False)
        y_n = Bottleneck(6, shortcut=False).apply(v, x, train=False)
        np.testing.assert_allclose(
            np.asarray(y_s), np.asarray(y_n + x), rtol=RTOL, atol=ATOL
        )

    def test_c2f_channel_math(self):
        """C2f output channels == features; concat is (n+2)*features/2 wide
        (components.py:106)."""
        x = jnp.zeros((1, 8, 8, 10))
        mod = C2f(12, num_bottlenecks=2)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == (1, 8, 8, 12)
        # conv2 kernel input dim = (n+2) * features / 2 = 4 * 6 = 24
        assert v["params"]["conv2"]["conv"]["kernel"].shape[2] == 24

    def test_c2f_reverse_concat_order(self):
        """Intermediate bottleneck outputs are concatenated newest-first
        (components.py:118) — verified by probing with block-diagonal convs."""
        # Build a C2f with identity-ish convs and check channel provenance via
        # gradient connectivity: output of conv2 w.r.t. each concat segment.
        x = jnp.asarray(
            np.random.default_rng(6).standard_normal((1, 4, 4, 8), dtype=np.float32)
        )
        mod = C2f(8, num_bottlenecks=2, shortcut=False)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        # Zero all of conv2 except the channels of the FIRST concat segment
        # (which must be the LAST bottleneck output y2).
        k = np.zeros_like(np.asarray(v["params"]["conv2"]["conv"]["kernel"]))
        k[:, :, :4, :] = 1.0  # first 4 input channels of conv2
        v["params"]["conv2"]["conv"]["kernel"] = jnp.asarray(k)

        y_full = mod.apply(v, x, train=False)
        # Now zero the last bottleneck's convs -> y2 becomes BN-only bias path;
        # if the first segment were x1/x2 instead, output would be unchanged.
        v2 = jax.tree_util.tree_map(lambda a: a, v)
        v2["params"]["m_1"]["conv2"]["conv"]["kernel"] = jnp.zeros_like(
            v["params"]["m_1"]["conv2"]["conv"]["kernel"]
        )
        y_cut = mod.apply(v2, x, train=False)
        assert not np.allclose(np.asarray(y_full), np.asarray(y_cut)), (
            "first concat segment must be the last bottleneck output"
        )

    def test_sppf_matches_manual(self):
        """SPPF == conv1 -> 3 chained 5x5 pools -> concat -> conv2."""
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((1, 8, 8, 8), dtype=np.float32)
        )
        mod = SPPF(8)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == (1, 8, 8, 8)
        # conv2 input = 4 * hidden = 4 * 4 = 16
        assert v["params"]["conv2"]["conv"]["kernel"].shape[2] == 16

    def test_msblock_shapes(self):
        x = jnp.zeros((1, 8, 8, 16))
        mod = MSBlock(24, kernel_size=5, num_branches=3)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == (1, 8, 8, 24)

    def test_msblock_dw_isolation_is_identity(self):
        """The depthwise optimization_barrier (shipped inference default,
        PERF.md r3) must not change values — only XLA fusion decisions."""
        from yolo_ms_tpu.nn.blocks import dw_isolation

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 8, 8, 16)),
            jnp.float32,
        )
        mod = MSBlock(24, kernel_size=5, num_branches=3)
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        with dw_isolation(0):
            base = mod.apply(v, x, train=False)
        with dw_isolation(3, "pre"):
            pre = mod.apply(v, x, train=False)
        with dw_isolation(3, "both"):
            both = mod.apply(v, x, train=False)
        assert jnp.array_equal(base, pre)
        assert jnp.array_equal(base, both)


def test_yolo_params_table():
    assert yolo_params("n") == (1 / 3, 1 / 4, 2.0)
    assert yolo_params("x") == (1.0, 1.25, 1.0)
    with pytest.raises(ValueError):
        yolo_params("z")
