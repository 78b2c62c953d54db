"""Feature-map visualization — test_model.py:35-183 equivalent.

Renders per-stage feature-map grids (backbone P3/P4/P5, neck N1/N2/N3),
head prediction histograms, and the decoded confidence distribution to PNG
files (the reference shows matplotlib windows; headless here).

Usage:
  python -m yolo_ms_tpu.tools.visualize --version n --image path.jpg \
      --out runs/viz
"""

from __future__ import annotations

import argparse
import os


def visualize(
    version: str,
    image_path: str | None,
    out_dir: str,
    num_classes: int = 80,
    channels_per_stage: int = 16,
    img_size: int = 640,
):
    import matplotlib

    matplotlib.use("Agg")
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
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
    from yolo_ms_tpu.models.registry import MODEL_ZOO, build_model, init_model
    from yolo_ms_tpu.models.yolo import Backbone, Neck

    os.makedirs(out_dir, exist_ok=True)
    model = build_model(version, num_classes=num_classes)
    # staged classes per family (mirrors tools/analyze.py)
    cls, sub_version, zoo_kwargs = MODEL_ZOO[version.lower()]
    se = {"use_se": True} if zoo_kwargs.get("use_se") else {}
    if cls is YOLOMS:
        backbone_mod, neck_mod = MSBackbone(sub_version, **se), MSNeck(sub_version, **se)
    elif cls is YOLOv8MS:
        backbone_mod, neck_mod = (
            V8MSBackbone(sub_version, **se),
            V8MSNeck(sub_version, **se),
        )
    else:
        backbone_mod, neck_mod = Backbone(sub_version), Neck(sub_version)
    variables = init_model(model, jax.random.PRNGKey(0), (img_size, img_size))

    if image_path:
        from yolo_ms_tpu.data.decode import decode_and_resize

        raw_img = decode_and_resize(image_path, img_size, img_size)
        x = jnp.asarray(raw_img[None], jnp.float32) / 255.0
    else:
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, img_size, img_size, 3))
        raw_img = (np.asarray(x[0]) * 255).astype(np.uint8)

    def grid_figure(feat, title, path):
        f = np.asarray(feat[0])  # [H, W, C]
        c = min(channels_per_stage, f.shape[-1])
        cols = 4
        rows = (c + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
        for i in range(rows * cols):
            ax = axes.flat[i]
            ax.axis("off")
            if i < c:
                ax.imshow(f[..., i], cmap="viridis")
                ax.set_title(f"ch {i}", fontsize=8)
        fig.suptitle(title)
        fig.tight_layout()
        fig.savefig(path, dpi=80)
        plt.close(fig)

    bb = backbone_mod
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    p3, p4, p5 = bb.apply(bb_vars, x, train=False)
    for name, f in (("P3", p3), ("P4", p4), ("P5", p5)):
        grid_figure(f, f"Backbone {name} {tuple(f.shape)}",
                    os.path.join(out_dir, f"backbone_{name}.png"))

    neck = neck_mod
    neck_vars = {
        "params": variables["params"]["neck"],
        "batch_stats": variables["batch_stats"]["neck"],
    }
    n1, n2, n3 = neck.apply(neck_vars, p3, p4, p5, train=False)
    for name, f in (("N1", n1), ("N2", n2), ("N3", n3)):
        grid_figure(f, f"Neck {name} {tuple(f.shape)}",
                    os.path.join(out_dir, f"neck_{name}.png"))

    raw = model.apply(variables, x, train=False)
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for i, r in enumerate(raw):
        axes[i].hist(np.asarray(r).ravel(), bins=80)
        axes[i].set_title(f"P{i + 3} raw logits {tuple(r.shape)}")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "head_histograms.png"), dpi=80)
    plt.close(fig)

    decoded = decode_predictions(raw, num_classes)
    conf = np.asarray(decoded[0, :, 4:]).max(-1)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(conf, bins=80)
    ax.set_title("max class confidence per anchor")
    ax.set_xlabel("sigmoid score")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "confidence_distribution.png"), dpi=80)
    plt.close(fig)

    print(f"Wrote visualizations to {out_dir}/")
    return out_dir


def main() -> None:
    parser = argparse.ArgumentParser(description="Visualize per-stage feature maps.")
    parser.add_argument("--version", type=str, default="n")
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--out", type=str, default="runs/viz")
    parser.add_argument("--num_classes", type=int, default=80)
    parser.add_argument("--img_size", type=int, default=640)
    args = parser.parse_args()
    visualize(
        args.version, args.image, args.out, args.num_classes,
        img_size=args.img_size,
    )


if __name__ == "__main__":
    main()
