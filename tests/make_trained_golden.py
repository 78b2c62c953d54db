"""Generate the trained-weights golden artifact (run on CPU, checked in).

The env has no real COCO data and no real pretrained checkpoint (zero
egress), so the strongest end-to-end accuracy evidence available is: train
the synthetic-rectangles recipe (the same one tests/test_learning.py gates),
then drive the TRAINED weights through the full inference stack. This script
produces, under tests/golden/trained/:

  - weights.npz            compact f32 params+batch_stats of the trained model
  - recipe.json            dataset/recipe metadata incl. final mAP@0.5
  - fixture_000.png        the eval image (checked in so the test is hermetic)
  - fixture_000_detections.json   golden detections from the full CLI
  - fixture_000_detected.jpg      the drawn output (human-inspectable proof)

tests/test_trained_golden.py replays weights.npz on fixture_000.png through
the Predictor and asserts detection parity with the golden JSON.

Usage: JAX_PLATFORMS=cpu python -m tests.make_trained_golden [arch] [epochs]

arch defaults to "n" (golden dir tests/golden/trained/ for back-compat);
any other zoo name writes tests/golden/trained_<arch>/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys


def golden_dir(arch: str) -> str:
    sub = "trained" if arch == "n" else f"trained_{arch}"
    return os.path.join(os.path.dirname(__file__), "golden", sub)


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = v
    return out


def unflatten_tree(flat):
    out = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def main(arch: str = "n", epochs: int = 80):
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.make_fixtures import make_coco_dataset
    from yolo_ms_tpu.train.trainer import Trainer
    from yolo_ms_tpu.utils.config import Config

    GOLDEN_DIR = golden_dir(arch)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    root = "/tmp/trained_golden_work"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # The tests/test_learning.py recipe (same seed/geometry), run a bit
    # longer for a confidently-converged model.
    images_dir, ann = make_coco_dataset(
        root, num_images=32, num_classes=3, img_w=320, img_h=256, seed=1
    )
    cfg = Config.from_dict(
        {
            "dataset": {
                "train_images_path": images_dir,
                "train_annotations_path": ann,
                "val_images_path": images_dir,
                "val_annotations_path": ann,
                "num_classes": 3,
                "max_gt": 8,
            },
            "model": {
                "architecture": arch,
                "input_size": [160, 160],
                "compute_dtype": "float32",
            },
            "training": {
                "batch_size": 16,
                "epochs": epochs,
                "learning_rate": 2e-3,
                "optimizer": "adam",
                "weight_decay": 0.0,
                "val_interval": 80,
                "save_period": 1000,
                "experiment_name": "trained_golden",
                "log_dir": os.path.join(root, "runs"),
                "augmentation": {"fliplr": 0.5},
                "grad_clip_norm": 10.0,
                "scheduler": {
                    "type": "cosine",
                    "cosine_t_max": epochs,
                    "warmup_steps": 20,
                },
            },
            "evaluation": {"batch_size": 16, "confidence_threshold": 0.25},
            "workers": 1,
        }
    )
    trainer = Trainer(cfg, verbose=True)
    trainer.fit()
    final_map = trainer.validate()
    print(f"final synthetic mAP@0.5: {final_map:.4f}")
    assert final_map > 0.5, f"recipe failed to converge (mAP {final_map})"

    # --- compact weights artifact (the EMA pair if present) ---
    params = (
        trainer.state.ema_params
        if trainer.state.ema_params is not None
        else trainer.state.params
    )
    batch_stats = (
        trainer.state.ema_batch_stats
        if trainer.state.ema_batch_stats is not None
        else trainer.state.batch_stats
    )
    flat = {}
    for coll, tree in (("params", params), ("batch_stats", batch_stats)):
        for k, v in flatten_tree(jax.device_get(tree), coll).items():
            flat[k] = np.asarray(v, np.float32)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "weights.npz"), **flat)

    # --- hermetic eval image ---
    fixture_src = os.path.join(images_dir, sorted(os.listdir(images_dir))[0])
    fixture_dst = os.path.join(GOLDEN_DIR, "fixture_000.png")
    import cv2

    cv2.imwrite(fixture_dst, cv2.imread(fixture_src))

    # --- drive the FULL CLI (config + checkpoint + image -> jpg + json) ---
    cfg_path = os.path.join(root, "golden_cfg.yaml")
    cfg.save(cfg_path)
    ckpt_path = os.path.join(
        root, "runs", "trained_golden", "weights", "last.ckpt"
    )
    from yolo_ms_tpu.tools.test import run as cli_run

    out_dir = os.path.join(root, "cli_out")
    cli_run(cfg_path, ckpt_path, fixture_dst, out_dir, conf_thresh=0.25)
    for name in os.listdir(out_dir):
        shutil.copy(os.path.join(out_dir, name), os.path.join(GOLDEN_DIR, name))

    with open(os.path.join(GOLDEN_DIR, "recipe.json"), "w") as f:
        json.dump(
            {
                "recipe": "tests/test_learning.py synthetic rectangles",
                "architecture": arch,
                "epochs": epochs,
                "final_map50": float(final_map),
                "backend": jax.default_backend(),
                "note": "weights.npz = EMA(params+batch_stats) f32",
            },
            f,
            indent=2,
        )
    print(f"golden artifacts written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "n",
        int(sys.argv[2]) if len(sys.argv) > 2 else 80,
    )
