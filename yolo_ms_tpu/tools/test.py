"""Inference CLI — `python -m yolo_ms_tpu.tools.test --config ... --checkpoint
... --source ...`.

Same CLI contract and outputs as the reference inference entry
(tools/test.py:278-302): annotated *_detected.jpg images + *_detections.json
per input image. Accepts reference .pt checkpoints (auto-converted) or our
orbax .ckpt directories.
"""

from __future__ import annotations

import argparse
import os
import traceback


def run(
    config_path: str,
    checkpoint_path: str,
    source_path: str,
    output_dir: str = "runs/detect/exp",
    conf_thresh: float = 0.25,
    iou_thresh_nms: float = 0.45,
    batch_size: int = 1,
) -> dict:
    from yolo_ms_tpu.infer.predictor import Predictor
    from yolo_ms_tpu.utils.checkpoint import load_serving_variables
    from yolo_ms_tpu.utils.config import load_config
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(config_path)
    arch = cfg.model.architecture
    nc = cfg.dataset.num_classes

    variables = load_serving_variables(checkpoint_path)

    predictor = Predictor(
        arch,
        variables,
        num_classes=nc,
        class_names=cfg.dataset.resolved_class_names(),
        input_size=tuple(cfg.model.input_size),
        conf_thresh=conf_thresh,
        iou_thresh=iou_thresh_nms,
        batch_size=batch_size,
        reg_max=cfg.model.reg_max,
    )
    # video / webcam source ('0' = webcam, coco_yolov8.yaml:71)
    if str(source_path).isdigit() or str(source_path).lower().endswith(
        (".mp4", ".avi", ".mov", ".mkv", ".webm")
    ):
        from yolo_ms_tpu.infer.video import predict_video

        os.makedirs(output_dir, exist_ok=True)
        out_video = os.path.join(output_dir, "detected.mp4")
        return predict_video(predictor, source_path, out_video)
    return predictor.predict_paths(source_path, output_dir)


def main() -> None:
    parser = argparse.ArgumentParser(description="Run detector inference on images.")
    parser.add_argument("--config", type=str, default="yolo_ms_tpu/configs/coco_yolov8.yaml")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--source", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="runs/detect/exp")
    parser.add_argument("--conf_thresh", type=float, default=0.25)
    parser.add_argument("--iou_thresh_nms", type=float, default=0.45)
    parser.add_argument("--batch_size", type=int, default=1)
    args = parser.parse_args()
    try:
        run(
            args.config,
            args.checkpoint,
            args.source,
            args.output_dir,
            args.conf_thresh,
            args.iou_thresh_nms,
            args.batch_size,
        )
    except FileNotFoundError as e:
        print(f"Error: {e}. Please check file paths.")
        raise SystemExit(1)
    except Exception:
        traceback.print_exc()
        raise SystemExit(1)


if __name__ == "__main__":
    main()
