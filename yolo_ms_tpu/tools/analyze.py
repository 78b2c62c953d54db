"""Model analyzer CLI — the main.py / test_model.py tooling equivalent.

Covers the reference's introspection surface (main.py:20-74,
yolov8/test/test_model.py:185-302): per-version parameter audit, per-stage
feature shapes on a real or random image, train-vs-eval output shape check,
8400-anchor verification, full-model == staged-pipeline consistency check,
and optional per-stage feature-map statistics dump.

Usage:
  python -m yolo_ms_tpu.tools.analyze --version n [--image path] [--all]
"""

from __future__ import annotations

import argparse


def analyze(
    version: str,
    image_path: str | None = None,
    num_classes: int = 80,
    img_size: int = 640,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.models.decode import decode_predictions
    from yolo_ms_tpu.models.ms import (
        MSBackbone,
        MSNeck,
        V8MSBackbone,
        V8MSNeck,
        YOLOMS,
        YOLOv8MS,
    )
    from yolo_ms_tpu.models.registry import (
        MODEL_ZOO,
        build_model,
        count_params,
        init_model,
    )
    from yolo_ms_tpu.models.yolo import Backbone, DetectHead, Neck

    # staged-pipeline classes per family (the MS head reuses the v8
    # decoupled head at the closest v8 width — models/ms.py YOLOMS)
    if version.lower() not in MODEL_ZOO:
        raise ValueError(
            f"Unknown architecture '{version}'. Available: {sorted(MODEL_ZOO)}"
        )
    cls, sub_version, zoo_kwargs = MODEL_ZOO[version.lower()]
    se = {"use_se": True} if zoo_kwargs.get("use_se") else {}
    if cls is YOLOMS:
        backbone_mod = MSBackbone(sub_version, **se)
        neck_mod = MSNeck(sub_version, **se)
        head_version = {"xs": "n", "s": "s", "m": "m"}[sub_version]
        family = f"YOLO-MS-{sub_version.upper()}" + ("*" if se else "")
    elif cls is YOLOv8MS:
        backbone_mod = V8MSBackbone(sub_version, **se)
        neck_mod = V8MSNeck(sub_version, **se)
        head_version = sub_version
        family = f"YOLOv8-MS-{sub_version.upper()}" + ("*" if se else "")
    else:
        backbone_mod = Backbone(sub_version)
        neck_mod = Neck(sub_version)
        head_version = sub_version
        family = f"YOLOv8-{sub_version.upper()}"

    print(f"\n{'=' * 60}\n{family} analysis\n{'=' * 60}")
    model = build_model(version, num_classes=num_classes)
    variables = init_model(model, jax.random.PRNGKey(0), (img_size, img_size))
    total = count_params(variables)
    print(f"Total parameters: {total / 1e6:.2f} million ({total:,})")

    # compiled per-image FLOPs from XLA's cost model (beyond the reference's
    # param-count-only audit, main.py:28-29): analysis of the jitted
    # eval-mode forward at the requested size, reported as GFLOPs/image to match the
    # model-zoo tables (model_zoos.md FLOPs column).
    try:
        compiled = (
            jax.jit(lambda v, x: model.apply(v, x, train=False))
            .lower(
                variables,
                jax.ShapeDtypeStruct((1, img_size, img_size, 3), jnp.float32),
            )
            .compile()
        )
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        if flops > 0:
            print(f"Forward FLOPs (XLA cost model, {img_size}x{img_size}): {flops / 1e9:.2f} G/image")
    except Exception as e:  # cost model availability varies per backend
        print(f"Forward FLOPs: unavailable ({type(e).__name__})")

    # per-stage parameter audit
    import jax.tree_util as jtu

    for stage in ("backbone", "neck", "head"):
        n = sum(x.size for x in jtu.tree_leaves(variables["params"][stage]))
        print(f"  {stage:10s}: {n / 1e6:.3f}M params")

    # input
    if image_path:
        from yolo_ms_tpu.data.decode import decode_and_resize

        img = decode_and_resize(image_path, img_size, img_size)
        x = jnp.asarray(img[None], jnp.float32) / 255.0
        print(f"Input image: {image_path}")
    else:
        x = jax.random.normal(jax.random.PRNGKey(1), (1, img_size, img_size, 3))
        print(f"Input: random normal [1, {img_size}, {img_size}, 3]")

    # staged forward: backbone -> neck -> head
    bb = backbone_mod
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    p3, p4, p5 = bb.apply(bb_vars, x, train=False)
    print("Backbone outputs:")
    for name, f in zip(("P3", "P4", "P5"), (p3, p4, p5)):
        print(f"  {name}: {tuple(f.shape)}  mean={float(f.mean()):+.4f} std={float(f.std()):.4f}")

    neck = neck_mod
    neck_vars = {
        "params": variables["params"]["neck"],
        "batch_stats": variables["batch_stats"]["neck"],
    }
    n1, n2, n3 = neck.apply(neck_vars, p3, p4, p5, train=False)
    print("Neck outputs:")
    for name, f in zip(("N1", "N2", "N3"), (n1, n2, n3)):
        print(f"  {name}: {tuple(f.shape)}  mean={float(f.mean()):+.4f} std={float(f.std()):.4f}")

    head = DetectHead(head_version, num_classes=num_classes)
    head_vars = {
        "params": variables["params"]["head"],
        "batch_stats": variables["batch_stats"]["head"],
    }
    raw = head.apply(head_vars, (n1, n2, n3), train=False)
    print("Head raw maps (training-mode output):")
    total_anchors = 0
    for i, r in enumerate(raw):
        anchors = r.shape[1] * r.shape[2]
        total_anchors += anchors
        print(f"  P{i + 3}: {tuple(r.shape)} - {anchors:,} anchors - {8 * 2**i}x downsampled")
    print(f"  Total anchors: {total_anchors:,}")

    decoded = decode_predictions(raw, num_classes)
    print(f"Decoded eval output: {tuple(decoded.shape)} "
          f"[batch, anchors, 4 box + {num_classes} classes]")
    expected = sum((img_size // s) ** 2 for s in (8, 16, 32))
    status = "OK" if decoded.shape[1] == expected else "MISMATCH"
    print(f"Anchor check: {decoded.shape[1]:,} == {expected:,} expected -> {status}")

    # consistency: staged pipeline == full model (test_model.py:276)
    full_raw = model.apply(variables, x, train=False)
    full_decoded = decode_predictions(full_raw, num_classes)
    ok = bool(jnp.allclose(full_decoded, decoded, atol=1e-5))
    print(f"Full model == staged pipeline: {'OK' if ok else 'FAILED'}")
    assert ok, "staged pipeline diverges from full model"
    return decoded


def main() -> None:
    parser = argparse.ArgumentParser(description="Analyze detector structure.")
    parser.add_argument("--version", type=str, default="n")
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--num_classes", type=int, default=80)
    parser.add_argument("--img_size", type=int, default=640)
    parser.add_argument(
        "--all", action="store_true", help="Analyze every YOLOv8 version (main.py:76-86)."
    )
    args = parser.parse_args()
    versions = ["n", "s", "m", "l", "x"] if args.all else [args.version]
    for v in versions:
        analyze(v, args.image, args.num_classes, args.img_size)


if __name__ == "__main__":
    main()
