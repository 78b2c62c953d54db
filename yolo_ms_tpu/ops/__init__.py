from yolo_ms_tpu.ops.iou import box_iou_xyxy, bbox_iou, ciou  # noqa: F401
from yolo_ms_tpu.ops.nms import batched_nms, nms_fixed  # noqa: F401
