"""Model-level tests: shapes, param counts, anchor counts, registry.

Mirrors the reference's structural smoke checks (main.py:20-74) as real
assertions: 8400 anchors at 640x640, [B,A,4+nc] decode output, per-version
parameter counts equal to the PyTorch reference model's exact totals.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from yolo_ms_tpu.models.decode import decode_predictions, make_anchors
from yolo_ms_tpu.models.registry import build_model, count_params, init_model

def _param_count(name: str, img: int = 64) -> int:
    m = build_model(name)
    dummy = jnp.zeros((1, img, img, 3), dtype=m.dtype)
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), dummy, train=False))
    return sum(x.size for x in jtu.tree_leaves(shapes["params"]))


class TestParamCounts:
    @pytest.mark.parametrize(
        "name,millions",
        [("n", 3.16), ("s", 10.50), ("m", 23.89), ("l", 40.02), ("x", 61.83)],
    )
    def test_yolov8_counts(self, name, millions):
        n = _param_count(name)
        assert abs(n / 1e6 - millions) < 0.02, f"{name}: {n/1e6:.2f}M"

    @pytest.mark.parametrize(
        "name,lo,hi",
        [("yolo-ms-xs", 4.3, 5.2), ("yolo-ms-s", 8.0, 8.8), ("yolo-ms-m", 21.5, 23.5)],
    )
    def test_yoloms_counts_in_zoo_range(self, name, lo, hi):
        """model_zoos.md:20-61 parameter ranges."""
        n = _param_count(name)
        assert lo < n / 1e6 < hi, f"{name}: {n/1e6:.2f}M not in [{lo},{hi}]"

    @pytest.mark.parametrize(
        "name,zoo_millions",
        [("yolov8-ms-n", 2.9), ("yolov8-ms-s", 9.5), ("yolov8-ms-m", 25.9)],
    )
    def test_yolov8ms_counts(self, name, zoo_millions):
        """model_zoos.md:168-209 (MS-Block applied to YOLOv8): N 2.9M,
        S 9.5M, M 25.9M. Calibrated to within 1% (models/ms.py V8MS_BLOCK)."""
        n = _param_count(name)
        assert abs(n / 1e6 - zoo_millions) / zoo_millions < 0.02, f"{n/1e6:.2f}M"

    def test_se_variant_adds_params(self):
        """The '*' SE-attention rows (model_zoos.md:93-125): a few percent
        more parameters than the base model, same output contract."""
        base, se = _param_count("yolo-ms-xs"), _param_count("yolo-ms-xs-se")
        assert base < se < base * 1.10


class TestForwardShapes:
    def test_raw_maps_and_decode(self):
        """Train output: 3 x [B,H,W,144]; decode: [B, A, 84]; A = sum HW."""
        img = 160  # small for CPU test speed; strides 8/16/32 -> 20/10/5
        m = build_model("n", num_classes=80)
        variables = init_model(m, jax.random.PRNGKey(0), (img, img))
        x = jnp.zeros((2, img, img, 3))
        raw = m.apply(variables, x, train=False)
        assert len(raw) == 3
        hw = [(img // s) for s in (8, 16, 32)]
        for r, s in zip(raw, hw):
            assert r.shape == (2, s, s, 4 * 16 + 80)
        dec = decode_predictions(raw, num_classes=80)
        a = sum(s * s for s in hw)
        assert dec.shape == (2, a, 84)
        # class scores are sigmoid -> in (0, 1)
        cls = np.asarray(dec[..., 4:])
        assert cls.min() >= 0.0 and cls.max() <= 1.0

    def test_anchor_count_640(self):
        """8400 anchors at 640x640 (main.py:65-67)."""
        shapes = [(80, 80), (40, 40), (20, 20)]
        anchors, strides = make_anchors(shapes)
        assert anchors.shape == (8400, 2)
        assert strides.shape == (8400, 1)
        a = np.asarray(anchors)
        # First anchor center of each level is (0.5, 0.5) in grid units.
        np.testing.assert_allclose(a[0], [0.5, 0.5])
        np.testing.assert_allclose(a[6400], [0.5, 0.5])
        np.testing.assert_allclose(a[-1], [19.5, 19.5])
        s = np.asarray(strides).ravel()
        assert (s[:6400] == 8).all() and (s[6400:8000] == 16).all() and (s[8000:] == 32).all()

    def test_train_mode_returns_same_shapes_and_updates_stats(self):
        img = 64
        m = build_model("n", num_classes=3)
        variables = init_model(m, jax.random.PRNGKey(0), (img, img))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, img, img, 3))
        raw, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert len(raw) == 3
        assert "batch_stats" in updates

    @pytest.mark.parametrize("name", ["yolov8-ms-n", "yolo-ms-xs-se"])
    def test_new_family_forward(self, name):
        img = 64
        m = build_model(name, num_classes=5)
        variables = init_model(m, jax.random.PRNGKey(0), (img, img))
        raw = m.apply(variables, jnp.zeros((1, img, img, 3)), train=False)
        dec = decode_predictions(raw, num_classes=5)
        a = sum((img // s) ** 2 for s in (8, 16, 32))
        assert dec.shape == (1, a, 9)

    def test_ms_forward(self):
        img = 64
        m = build_model("yolo-ms-xs", num_classes=5)
        variables = init_model(m, jax.random.PRNGKey(0), (img, img))
        raw = m.apply(variables, jnp.zeros((1, img, img, 3)), train=False)
        dec = decode_predictions(raw, num_classes=5)
        a = sum((img // s) ** 2 for s in (8, 16, 32))
        assert dec.shape == (1, a, 9)


class TestRegistry:
    def test_every_zoo_name_builds(self):
        """Every registry entry constructs and abstractly initializes
        (eval_shape: no FLOPs) with a nonzero param count."""
        from yolo_ms_tpu.models.registry import MODEL_ZOO

        for name in MODEL_ZOO:
            n = _param_count(name)
            assert n > 1e6, f"{name}: suspicious param count {n}"

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            build_model("yolov99")

    def test_aliases(self):
        assert build_model("yolov8-n").version == "n"
        assert build_model("YOLO-MS").version == "m"

    def test_jit_forward(self):
        """Full forward+decode is a single jittable graph."""
        img = 64
        m = build_model("n", num_classes=2)
        variables = init_model(m, jax.random.PRNGKey(0), (img, img))

        @jax.jit
        def fwd(v, x):
            raw = m.apply(v, x, train=False)
            return decode_predictions(raw, num_classes=2)

        out = fwd(variables, jnp.zeros((1, img, img, 3)))
        assert out.shape[0] == 1
