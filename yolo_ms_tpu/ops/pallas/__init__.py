from yolo_ms_tpu.ops.pallas.select import select_scale, select_supported  # noqa: F401
