"""infer/layouts.py — AUTO-entry-layout serving wrapper.

On the CPU test backend the wrapper takes its fallback path (plain jit);
these tests pin the contract either way: outputs equal the un-wrapped
function, per-shape caching works, and a force-enabled wrapper still
produces correct results (via a successful AUTO compile or the
transparent fallback)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.infer.layouts import AutoLayoutInfer


def _fn(variables, images):
    w = variables["params"]["w"]
    x = images.astype(jnp.float32) / 255.0
    return {"y": jnp.einsum("bhwc,cd->bd", x, w)}


def _variables():
    rng = np.random.default_rng(0)
    return {"params": {"w": jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)}}


def test_fallback_matches_plain_jit():
    v = _variables()
    imgs = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    )
    wrapped = AutoLayoutInfer(_fn)
    ref = jax.jit(_fn)(v, imgs)
    out = wrapped(v, imgs)
    np.testing.assert_allclose(out["y"], ref["y"], rtol=1e-6)


def test_multiple_shapes_cached_independently():
    v = _variables()
    wrapped = AutoLayoutInfer(_fn)
    for b in (1, 3):
        imgs = jnp.asarray(
            np.random.default_rng(b).integers(
                0, 256, (b, 8, 8, 3), dtype=np.uint8
            )
        )
        out = wrapped(v, imgs)
        ref = jax.jit(_fn)(v, imgs)
        np.testing.assert_allclose(out["y"], ref["y"], rtol=1e-6)


def test_image_format_none_on_fallback_path():
    """Producers must get None (= plain device_put) whenever the wrapper
    is on its fallback path, e.g. on the CPU test backend."""
    v = _variables()
    imgs = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    )
    wrapped = AutoLayoutInfer(_fn)
    if wrapped._disabled:
        assert wrapped.image_format(v, imgs) is None


def test_force_enabled_still_correct():
    """Force the AUTO path even off-TPU: either the AOT compile works and
    outputs match, or the wrapper must fall back transparently."""
    v = _variables()
    imgs = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    )
    wrapped = AutoLayoutInfer(_fn)
    wrapped._disabled = False
    out = wrapped(v, imgs)
    ref = jax.jit(_fn)(v, imgs)
    np.testing.assert_allclose(out["y"], ref["y"], rtol=1e-6)
