"""Run the tests/test_learning.py recipe on the real TPU and print mAP@0.5.

The pytest variant pins CPU (tests/conftest.py); this standalone runner is
how the end-to-end learning number on TPU hardware is (re)validated after
perf changes — r2 recorded 0.957 with this exact recipe.

Usage: python benchmarks/learn_tpu_check.py [arch] [epochs]
"""

from __future__ import annotations

import os
import sys
import tempfile


def main(arch: str = "n", epochs: int = 60) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from tests.make_fixtures import make_coco_dataset
    from yolo_ms_tpu.train.trainer import Trainer
    from yolo_ms_tpu.utils.config import Config

    print(f"device: {jax.devices()[0]}", flush=True)
    root = tempfile.mkdtemp(prefix="learn_tpu_")
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
                # exercise GT shape bucketing (default [32,64] is inert at
                # max_gt=8): most fixture batches dispatch at [B, 4]
                "gt_buckets": [4],
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
                "val_interval": epochs,
                "save_period": 1000,
                "experiment_name": "learn",
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
    # LEARN_MULTISCALE=1: same recipe with multi-scale training (canvas
    # 128/160/192 per 2-batch block) — the accuracy gate for the
    # training.multiscale_sizes feature.
    if os.environ.get("LEARN_MULTISCALE") == "1":
        cfg.training.multiscale_sizes = [128, 160, 192]
        cfg.training.multiscale_interval = 2
        print("multiscale: [128, 160, 192] / interval 2", flush=True)
    trainer = Trainer(cfg, verbose=False)
    trainer.fit()
    final = trainer.validate()
    print(f"final mAP@0.5 = {final:.4f} ({arch}, {epochs} epochs, TPU)", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "n", int(a[1]) if len(a) > 1 else 60)
