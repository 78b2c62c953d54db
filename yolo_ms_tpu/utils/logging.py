"""Metric logging: TensorBoard scalars with the reference's names.

The reference logs via torch.utils.tensorboard (train.py:202-205, :348,
:385-390, :396, :407). Same scalar names here so dashboards transfer:
Training/Learning_Rate, Loss/Batch/{Total,Box,Cls,DFL}, Loss/Epoch/Total,
Validation/mAP_50. Falls back to a CSV writer if tensorboard is unavailable.
"""

from __future__ import annotations

import csv
import os


class MetricLogger:
    """Multi-host: only process 0 writes events (a pod's shared log dir
    would otherwise get interleaved event files from every host)."""

    def __init__(self, log_dir: str):
        from yolo_ms_tpu.parallel.distributed import is_primary_process

        self._tb = None
        self._csv = None
        if not is_primary_process():
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            path = os.path.join(log_dir, "metrics.csv")
            self._csv_file = open(path, "a", newline="")
            self._csv = csv.writer(self._csv_file)

    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        elif self._csv is not None:
            self._csv.writerow([step, tag, float(value)])
            self._csv_file.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._csv is not None:
            self._csv_file.close()
