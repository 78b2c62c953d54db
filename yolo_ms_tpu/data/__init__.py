from yolo_ms_tpu.data.coco import CocoDetectionDataset  # noqa: F401
from yolo_ms_tpu.data.loader import DetectionLoader  # noqa: F401
