"""Standalone validation CLI — `python -m yolo_ms_tpu.tools.val`.

Evaluates a checkpoint's mAP on the config's validation dataset WITHOUT
constructing a Trainer (the reference can only validate inside its training
loop, train.py:20-165 / :404-414). Any checkpoint flavor works: orbax train
states (EMA pair preferred), eval variables, BN-folded deploy exports, or
reference .pt files.

The device loop mirrors Trainer.validate: uint8 batches -> jitted
normalize + forward + fused DFL decode + class-aware NMS on device
(Predictor.predict_batch), host-side COCO-protocol mAP accumulation.
evaluation.map_iou_thresholds = "coco" reports AP@[.50:.05:.95] too.
"""

from __future__ import annotations

import argparse


def run(config_path: str, checkpoint_path: str, verbose: bool = True) -> dict:
    import numpy as np

    from yolo_ms_tpu.data.coco import CocoDetectionDataset
    from yolo_ms_tpu.data.loader import DetectionLoader
    from yolo_ms_tpu.eval.coco_map import MeanAveragePrecision
    from yolo_ms_tpu.infer.predictor import Predictor
    from yolo_ms_tpu.ops.iou import xywh_to_xyxy
    from yolo_ms_tpu.utils.checkpoint import load_serving_variables
    from yolo_ms_tpu.utils.config import load_config
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(config_path)
    dcfg, ecfg = cfg.dataset, cfg.evaluation
    assert dcfg.val_annotations_path, "config has no validation dataset"

    variables = load_serving_variables(checkpoint_path)
    img_size = tuple(ecfg.img_size or cfg.model.input_size)
    predictor = Predictor(
        cfg.model.architecture,
        variables,
        num_classes=dcfg.num_classes,
        class_names=dcfg.resolved_class_names(),
        input_size=img_size,
        conf_thresh=ecfg.confidence_threshold,
        iou_thresh=ecfg.iou_threshold,
        batch_size=ecfg.batch_size,
        reg_max=cfg.model.reg_max,
    )

    ds = CocoDetectionDataset(
        dcfg.val_images_path,
        dcfg.val_annotations_path,
        num_classes=dcfg.num_classes,
        verbose=verbose,
    )
    loader = DetectionLoader(
        ds,
        batch_size=ecfg.batch_size,
        img_size=img_size,
        max_gt=dcfg.max_gt,
        is_train=False,
        seed=0,
        num_workers=cfg.workers,
        drop_last=False,
        device_normalize=True,
    )

    thresholds = getattr(ecfg, "map_iou_thresholds", [0.5])
    if isinstance(thresholds, str):
        if thresholds.lower() != "coco":
            raise ValueError(f"map_iou_thresholds: unknown preset {thresholds!r}")
        thresholds = [0.5 + 0.05 * i for i in range(10)]
    if 0.5 not in [round(float(t), 2) for t in thresholds]:
        thresholds = [0.5] + list(thresholds)
    metric = MeanAveragePrecision(iou_thresholds=thresholds)

    ih, iw = img_size
    scale = np.asarray([iw, ih, iw, ih], np.float32)
    n_images = 0
    for batch in loader.epoch(0):
        out = predictor.predict_batch(batch["images"])
        preds, targets = [], []
        for i in range(batch["num_valid"]):
            valid = out["valid"][i]
            preds.append(
                {
                    "boxes": out["boxes"][i][valid],
                    "scores": out["scores"][i][valid],
                    "labels": out["classes"][i][valid],
                }
            )
            m = batch["mask"][i]
            targets.append(
                {
                    "boxes": np.asarray(
                        xywh_to_xyxy(batch["boxes"][i][m] * scale)
                    ),
                    "labels": batch["labels"][i][m],
                }
            )
        metric.update(preds, targets)
        n_images += batch["num_valid"]

    result = metric.compute()
    map50 = result.get("map_50", result["map"])
    if verbose:
        extra = (
            f", AP@[.5:.95] = {result['map']:.4f}" if len(thresholds) > 1 else ""
        )
        print(f"Validation: {n_images} images, mAP@0.5 = {map50:.4f}{extra}")
    return result


def main() -> None:
    p = argparse.ArgumentParser(
        description="Evaluate a checkpoint's mAP on the config's val dataset"
    )
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True, help=".ckpt dir or .pt file")
    args = p.parse_args()
    run(args.config, args.checkpoint)


if __name__ == "__main__":
    main()
