"""Deploy-mode BN folding (models/deploy.py) equivalence tests.

The folded conv(+bias)+SiLU graph must reproduce the train-structure eval
path (conv -> BatchNorm(running stats) -> SiLU) to float tolerance, for
both plain and MS (depthwise-containing) models, after batch_stats have
drifted from their init values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
from yolo_ms_tpu.models.registry import build_model, init_model


def _trained_ish_variables(model, rng, img=64):
    """Init then perturb params/batch_stats so folding is non-trivial."""
    variables = init_model(model, jax.random.PRNGKey(0), (img, img))

    def jitter(leaf, key_scale):
        noise = rng.normal(0, 0.05, leaf.shape).astype(np.float32)
        return leaf + jnp.asarray(noise) * key_scale

    params = jax.tree_util.tree_map(lambda p: jitter(p, 1.0), model and variables["params"])
    stats = jax.tree_util.tree_map(
        lambda s: jnp.abs(jitter(s, 1.0)) + 0.05, variables["batch_stats"]
    )
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("arch", ["n", "yolo-ms-xs", "yolov8-ms-n", "yolo-ms-xs-se"])
def test_folded_matches_eval(arch):
    model = build_model(arch, num_classes=8)
    rng = np.random.default_rng(0)
    variables = _trained_ish_variables(model, rng)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    want = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    assert "batch_stats" not in folded
    with deploy_mode():
        got = model.apply(folded, x, train=False)

    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4
        )


def test_deploy_structure_has_no_bn():
    model = build_model("n", num_classes=8)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    folded = fold_batchnorm(variables)
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    paths = ["/".join(str(k) for k in p) for p, _ in flat]
    assert not any("bn" in p for p in paths)
    assert any("bias" in p for p in paths)

    # deploy-mode init builds exactly the folded structure
    with deploy_mode():
        deploy_init = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
    want_tree = jax.tree_util.tree_structure(folded)
    got_tree = jax.tree_util.tree_structure(deploy_init)
    assert want_tree == got_tree


def test_export_roundtrip(tmp_path):
    """tools.export writes a folded checkpoint that the Predictor detects
    and uses as-is, reproducing the in-process folded outputs."""
    from yolo_ms_tpu.infer.predictor import Predictor
    from yolo_ms_tpu.models.deploy import is_deploy_variables
    from yolo_ms_tpu.tools.export import run as export_run
    from yolo_ms_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    model = build_model("n", num_classes=8)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    train_ckpt = str(tmp_path / "train.ckpt")
    save_checkpoint(train_ckpt, variables)

    out_ckpt = str(tmp_path / "deploy.ckpt")
    info = export_run(train_ckpt, out_ckpt)
    assert info["params"] > 0

    restored = restore_checkpoint(out_ckpt)
    assert is_deploy_variables(restored)

    p_exported = Predictor(
        "n", restored, num_classes=8, input_size=(64, 64), conf_thresh=1e-6
    )
    assert p_exported.deploy
    p_inproc = Predictor(
        "n", variables, num_classes=8, input_size=(64, 64), conf_thresh=1e-6
    )
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    a = p_exported.predict_batch(imgs)
    b = p_inproc.predict_batch(imgs)
    np.testing.assert_array_equal(a["valid"], b["valid"])
    np.testing.assert_allclose(
        a["boxes"][a["valid"]], b["boxes"][b["valid"]], rtol=1e-5, atol=1e-4
    )


def test_stablehlo_export_roundtrip(tmp_path):
    """The StableHLO serving artifact is self-contained: deserializing the
    bytes and calling it reproduces the in-process serving outputs with no
    model code or checkpoint — weights are baked into the graph."""
    from jax import export as jexport

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.tools.export import export_stablehlo

    arch, nc, hw = "n", 4, (64, 64)
    model = build_model(arch, num_classes=nc, dtype=jnp.bfloat16)
    variables = fold_batchnorm(init_model(model, jax.random.PRNGKey(0), hw))
    out = str(tmp_path / "serve.stablehlo")
    info = export_stablehlo(
        variables, arch, nc, out, batch=2, img_size=hw, conf_thresh=1e-6
    )
    assert info["bytes"] > 0

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 256, (2, *hw, 3), dtype=np.uint8))
    with open(out, "rb") as f:
        restored = jexport.deserialize(f.read())
    got = restored.call(imgs)

    def serve(images_u8):
        x = device_normalize_images(images_u8, jnp.bfloat16)
        with deploy_mode():
            raw = model.apply(variables, x, train=False, split_head=True)
        return fused_postprocess(raw, nc, conf_thresh=1e-6)

    want = jax.jit(serve)(imgs)
    assert set(got) == set(want)
    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(want["valid"]))
    for k in ("boxes", "scores", "classes"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-4
        )


def test_export_prefers_ema_params(tmp_path):
    """EMA-trained runs validate the EMA weights; export must fold those,
    not the raw params."""
    from yolo_ms_tpu.models.deploy import fold_batchnorm
    from yolo_ms_tpu.tools.export import run as export_run
    from yolo_ms_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    model = build_model("n", num_classes=8)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    ema = jax.tree_util.tree_map(lambda p: p + 1.0, variables["params"])
    state_ckpt = str(tmp_path / "state.ckpt")
    save_checkpoint(
        state_ckpt,
        {
            "state": {
                "params": variables["params"],
                "ema_params": ema,
                "batch_stats": variables["batch_stats"],
            }
        },
    )
    out = str(tmp_path / "deploy.ckpt")
    export_run(state_ckpt, out)
    got = restore_checkpoint(out)
    want = fold_batchnorm({"params": ema, "batch_stats": variables["batch_stats"]})
    flat_got = jax.tree_util.tree_leaves(got["params"])
    flat_want = jax.tree_util.tree_leaves(want["params"])
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_predictor_uses_folding():
    from yolo_ms_tpu.infer.predictor import Predictor

    model = build_model("n", num_classes=8)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    p = Predictor("n", variables, num_classes=8, input_size=(64, 64), conf_thresh=1e-6)
    assert p.deploy
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    out = p.predict_batch(imgs)
    assert np.isfinite(out["boxes"]).all()

    p2 = Predictor(
        "n", variables, num_classes=8, input_size=(64, 64), conf_thresh=1e-6, deploy=False
    )
    out2 = p2.predict_batch(imgs)
    v = out["valid"] & out2["valid"]
    np.testing.assert_allclose(out["boxes"][v], out2["boxes"][v], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(out["scores"][v], out2["scores"][v], rtol=1e-3, atol=1e-4)
