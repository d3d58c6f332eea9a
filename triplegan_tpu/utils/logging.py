"""Metrics logging / observability (rebuild of the reference's tf.summary +
FileWriter + stdout prints, SURVEY.md §2.1 #12, §5).

Scalars go to a JSONL file (always) and to TensorBoard via tensorboardX
(when importable); sample grids go to PNG + TensorBoard images. Metrics are
accumulated on device by the compiled step and fetched once per log interval
— no per-step host syncs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricsLogger:
    def __init__(self, workdir: str, use_tensorboard: bool = True, enabled: bool = True):
        """``enabled=False`` turns every method into a no-op and opens no
        files — non-coordinator processes of a multi-host run pass this so
        only one process writes to a (possibly shared) run dir."""
        self._enabled = enabled
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a", buffering=1)
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float], prefix: str = "") -> None:
        if not self._enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            name = f"{prefix}{k}"
            rec[name] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(name, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")

    def image(self, step: int, name: str, image_uint8: np.ndarray) -> None:
        if self._tb is not None:
            img = image_uint8
            if img.ndim == 2:
                img = img[..., None]
            self._tb.add_image(name, img, int(step), dataformats="HWC")

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
