from yolo_ms_tpu.utils.config import Config, load_config  # noqa: F401
