"""Slow end-to-end learning test: the full stack must overfit synthetic data.

Gated behind YOLO_MS_TPU_SLOW_TESTS=1 (takes minutes). On TPU this exact
recipe reaches mAP@0.5 = 0.957 in 60 epochs (recorded 2026-08-17, round 2 —
up from 0.77 in round 1, chiefly the TAL stop_gradient fix: the leaked
assignment gradient was ~135x the intended signal); the CI variant uses a
smaller budget and a looser bar.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("YOLO_MS_TPU_SLOW_TESTS") != "1",
    reason="slow learning test (set YOLO_MS_TPU_SLOW_TESTS=1)",
)


def test_overfits_synthetic_rectangles(tmp_path):
    from tests.make_fixtures import make_coco_dataset
    from yolo_ms_tpu.train.trainer import Trainer
    from yolo_ms_tpu.utils.config import Config

    root = str(tmp_path)
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
                "architecture": "n",
                "input_size": [160, 160],
                "compute_dtype": "float32",
            },
            "training": {
                "batch_size": 16,
                "epochs": 60,
                "learning_rate": 2e-3,
                "optimizer": "adam",
                "weight_decay": 0.0,
                "val_interval": 60,
                "save_period": 1000,
                "experiment_name": "learn",
                "log_dir": os.path.join(root, "runs"),
                "augmentation": {"fliplr": 0.5},
                "grad_clip_norm": 10.0,
                "scheduler": {"type": "cosine", "cosine_t_max": 60, "warmup_steps": 20},
            },
            "evaluation": {"batch_size": 16, "confidence_threshold": 0.25},
            "workers": 1,
        }
    )
    trainer = Trainer(cfg, verbose=False)
    trainer.fit()
    final = trainer.validate()
    assert final > 0.15, f"model failed to learn: mAP@0.5 = {final}"
