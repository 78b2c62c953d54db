from yolo_ms_tpu.train.assigner import task_aligned_assign  # noqa: F401
from yolo_ms_tpu.train.loss import DetectionLoss, detection_loss  # noqa: F401
