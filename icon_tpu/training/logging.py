"""Metric logging (reference: TensorBoardLogger + colored progress,
apps/train.py:79-81, lib/common/train_util.py:407-455).

Writes JSONL always; mirrors scalars to TensorBoard via tf.summary when
TensorFlow is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        try:
            import tensorflow as tf
            self._tb = tf.summary.create_file_writer(
                os.path.join(log_dir, "tb", name))
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float],
            prefix: str = "train") -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({f"{prefix}/{k}": float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{prefix}/{k}", float(v), step=step)

    def close(self):
        self._fh.close()
