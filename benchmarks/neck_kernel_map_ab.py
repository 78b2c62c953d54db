"""mAP A/B for the per-level neck kernels (k579 default vs round-2 k777).

Trains yolo-ms-xs on the synthetic-rectangles learning recipe
(tests/test_learning.py) once per variant and reports final mAP@0.5 —
the accuracy check VERDICT r2 item 3 requires before shipping the
kernel re-balance. Run on TPU (minutes per variant).

Usage: python benchmarks/neck_kernel_map_ab.py [epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile


def run_variant(kernels, epochs: int, root: str) -> float:
    import yolo_ms_tpu.models.ms as ms
    from tests.make_fixtures import make_coco_dataset
    from yolo_ms_tpu.train.trainer import Trainer
    from yolo_ms_tpu.utils.config import Config

    ms.NECK_KERNELS = kernels  # module default read when neck_kernels=None

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
                "architecture": "yolo-ms-xs",
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
                "save_period": 100000,
                "experiment_name": f"neck_ab_{'_'.join(map(str, kernels))}",
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
    trainer = Trainer(cfg, verbose=False)
    trainer.fit()
    return float(trainer.validate())


def main(epochs: int = 60) -> None:
    results = {}
    for name, kernels in [("k777", (7, 7, 7)), ("k579", (5, 7, 9))]:
        with tempfile.TemporaryDirectory() as root:
            results[name] = round(run_variant(kernels, epochs, root), 4)
        print(f"{name}: mAP@0.5 = {results[name]}", file=sys.stderr)
    print(json.dumps({"epochs": epochs, **results}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
