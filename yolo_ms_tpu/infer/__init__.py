from yolo_ms_tpu.infer.predictor import Predictor  # noqa: F401
