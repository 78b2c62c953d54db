from yolo_ms_tpu.eval.coco_map import MeanAveragePrecision  # noqa: F401
