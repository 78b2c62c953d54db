from yolo_ms_tpu.ops.pallas.nms_kernel import nms_pallas  # noqa: F401
