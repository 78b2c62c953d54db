"""yolo_ms_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch rebuild of the capabilities of the YOLO-MS/YOLOv8 reference
implementation (rafaelghiorzi/YOLO-MS), designed TPU-first:

- NHWC tensors, bfloat16-friendly compute, static shapes everywhere.
- Pure-functional models (flax.linen) — params are pytrees, forward is jittable.
- On-device post-processing (DFL decode + batched NMS) with no host round-trips.
- Data-parallel training over a ``jax.sharding.Mesh`` — cross-replica BatchNorm
  and gradient reduction come from GSPMD collectives over ICI.
- A host-side streaming data pipeline with a native C++ JPEG decode path.

Package map (mirrors SURVEY.md §2 component inventory):
    nn/        L1 primitive blocks (ConvBnSiLU, Bottleneck, C2f, SPPF, DFL, MSBlock ...)
    models/    L2 model compositions (YOLOv8 n/s/m/l/x, YOLO-MS XS/S/M) + decode
    ops/       device ops: IoU family, batched NMS, Pallas kernels
    data/      L4 COCO dataset, augmentations, batching/padding, loaders
    train/     L3+L5 TAL assigner, detection loss, optimizers, train loop
    infer/     L5 inference pipeline (preprocess -> forward -> decode -> NMS -> draw/JSON)
    eval/      COCO-protocol mAP evaluator
    parallel/  device mesh + sharding rules (DP over ICI)
    utils/     config system, checkpointing, logging, profiling
    tools/     CLI entry points (train / test / analyze)
"""

__version__ = "0.1.0"

from yolo_ms_tpu.models.registry import build_model, MODEL_ZOO  # noqa: F401
