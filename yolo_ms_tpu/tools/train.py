"""Training CLI — `python -m yolo_ms_tpu.tools.train --config cfg.yaml`.

Same CLI contract as the reference (tools/train.py:439-455): --config points
at a YAML file with the reference schema; optional --resume restores a full
training state checkpoint (capability the reference lacks).
"""

from __future__ import annotations

import argparse
import traceback


def main() -> None:
    parser = argparse.ArgumentParser(description="Train a YOLO detector on TPU.")
    parser.add_argument(
        "--config",
        type=str,
        default="yolo_ms_tpu/configs/coco_yolov8.yaml",
        help="Path to the YAML configuration file.",
    )
    parser.add_argument(
        "--resume", type=str, default=None, help="Path to a .ckpt to resume from."
    )
    args = parser.parse_args()

    from yolo_ms_tpu.parallel.distributed import maybe_initialize_distributed
    from yolo_ms_tpu.utils.config import load_config
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache
    from yolo_ms_tpu.train.trainer import Trainer

    # Multi-host (TPU pod / multi-slice): must run before any other jax call
    # so jax.devices() spans all hosts; no-op on single-host.
    if maybe_initialize_distributed():
        from yolo_ms_tpu.parallel.distributed import process_info

        print(f"jax.distributed initialized: {process_info()}")
    enable_compilation_cache()
    try:
        cfg = load_config(args.config)
        trainer = Trainer(cfg)
        if args.resume:
            trainer.resume(args.resume)
        trainer.fit()
    except FileNotFoundError as e:
        print(f"Error: {e}. Check the config path and dataset paths inside it.")
        raise SystemExit(1)
    except Exception:
        traceback.print_exc()
        raise SystemExit(1)


if __name__ == "__main__":
    main()
