from yolo_ms_tpu.infer.layouts import AutoLayoutInfer  # noqa: F401
from yolo_ms_tpu.infer.predictor import Predictor  # noqa: F401
