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

    def log_images(self, step: int, images: Dict[str, "object"],
                   prefix: str = "train") -> str:
        """Save a horizontal grid of [H, W, 3]-ish arrays in [-1, 1] or
        [0, 1] as PNG under ``<log_dir>/images`` (the reference posts the
        same panels to TensorBoard, apps/ICON.py:694-727 render_func), and
        mirror to tf.summary when available."""
        import numpy as np
        from PIL import Image

        panels = []
        for name, arr in images.items():
            a = np.asarray(arr, np.float32)
            if a.ndim == 2:
                a = a[..., None].repeat(3, -1)
            if a.shape[-1] == 1:
                a = a.repeat(3, -1)
            if a.min() < -0.01:                     # [-1, 1] -> [0, 1]
                a = a * 0.5 + 0.5
            panels.append(np.clip(a, 0, 1))
        h = max(p.shape[0] for p in panels)
        panels = [np.pad(p, ((0, h - p.shape[0]), (0, 0), (0, 0)))
                  for p in panels]
        grid = np.concatenate(panels, axis=1)
        out_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{prefix}_{step:07d}.png")
        Image.fromarray((grid * 255).astype("uint8")).save(path)
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.image(f"{prefix}/panels", grid[None], step=step)
        return path

    def close(self):
        self._fh.close()
