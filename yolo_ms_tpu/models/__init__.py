from yolo_ms_tpu.models.yolo import Backbone, Neck, Head, YOLOv8  # noqa: F401
from yolo_ms_tpu.models.ms import (  # noqa: F401
    MSBackbone,
    MSNeck,
    V8MSBackbone,
    V8MSNeck,
    YOLOMS,
    YOLOv8MS,
)
from yolo_ms_tpu.models.decode import decode_predictions, make_anchors  # noqa: F401
from yolo_ms_tpu.models.registry import build_model, MODEL_ZOO  # noqa: F401
