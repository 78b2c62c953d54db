"""Model zoo registry — build any supported detector by name.

Covers the reference's model family surface: YOLOv8 n/s/m/l/x via
(depth,width,ratio) multipliers (components.py:193-209, yolov8.py:8) plus the
YOLO-MS XS/S/M variants from the model-zoo tables (model_zoos.md:20-61).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from yolo_ms_tpu.models.yolo import YOLOv8
from yolo_ms_tpu.models.ms import YOLOMS, YOLOv8MS

# name -> (builder class, version arg, extra constructor kwargs)
MODEL_ZOO: dict[str, tuple[Any, str, dict]] = {
    # YOLOv8 family — reference parity (single-letter names match the
    # reference's config `model.architecture` field, coco_yolov8.yaml:13).
    "n": (YOLOv8, "n", {}),
    "s": (YOLOv8, "s", {}),
    "m": (YOLOv8, "m", {}),
    "l": (YOLOv8, "l", {}),
    "x": (YOLOv8, "x", {}),
    "yolov8-n": (YOLOv8, "n", {}),
    "yolov8-s": (YOLOv8, "s", {}),
    "yolov8-m": (YOLOv8, "m", {}),
    "yolov8-l": (YOLOv8, "l", {}),
    "yolov8-x": (YOLOv8, "x", {}),
    # YOLO-MS family (model_zoos.md:20-61).
    "yolo-ms-xs": (YOLOMS, "xs", {}),
    "yolo-ms-s": (YOLOMS, "s", {}),
    "yolo-ms": (YOLOMS, "m", {}),
    "yolo-ms-m": (YOLOMS, "m", {}),
    # SE-attention variants — the zoo's '*' rows (model_zoos.md:93-125).
    "yolo-ms-xs-se": (YOLOMS, "xs", {"use_se": True}),
    "yolo-ms-s-se": (YOLOMS, "s", {"use_se": True}),
    "yolo-ms-m-se": (YOLOMS, "m", {"use_se": True}),
    # YOLOv8-MS family — MS-Block applied to the v8 skeleton
    # (model_zoos.md:168-209).
    "yolov8-ms-n": (YOLOv8MS, "n", {}),
    "yolov8-ms-s": (YOLOv8MS, "s", {}),
    "yolov8-ms-m": (YOLOv8MS, "m", {}),
}


def build_model(
    architecture: str,
    num_classes: int = 80,
    reg_max: int = 16,
    dtype: jnp.dtype = jnp.float32,
):
    """Instantiate a model module by zoo name (case-insensitive)."""
    key = architecture.lower()
    if key not in MODEL_ZOO:
        raise ValueError(
            f"Unknown architecture '{architecture}'. Available: {sorted(MODEL_ZOO)}"
        )
    cls, version, kwargs = MODEL_ZOO[key]
    return cls(
        version=version, num_classes=num_classes, reg_max=reg_max, dtype=dtype, **kwargs
    )


def init_model(
    model, rng: jax.Array, input_size: tuple[int, int] = (640, 640)
):
    """Initialize variables with a dummy NHWC batch; returns the variable dict
    {'params': ..., 'batch_stats': ...}."""
    dummy = jnp.zeros((1, input_size[0], input_size[1], 3), dtype=model.dtype)
    return model.init(rng, dummy, train=False)


def count_params(variables) -> int:
    """Total trainable parameter count (main.py:28 equivalent)."""
    return sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"])
    )
