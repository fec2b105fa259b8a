"""Metrics logging — scalar streams + optional TensorBoard.

The reference optionally logs loss / GP_support_accuracy /
GP_query_accuracy / test_accuracy scalars and a z_support histogram via
tensorboardX (reference methods/DKT.py:16-21, 52-56, 167-196, 293). Here
the primary sink is an append-only JSONL file (machine-readable, zero
dependencies); a tensorboardX SummaryWriter is attached transparently when
the package is importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: Optional[str], tensorboard: bool = True):
        self.log_dir = log_dir
        self._file = None
        self._tb = None
        if log_dir is None:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                self._tb = None

    def log_scalars(self, step: int, **scalars) -> None:
        if self._file is None:
            return
        record = {"step": int(step), "time": time.time()}
        for name, value in scalars.items():
            record[name] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(name, float(value), step)
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()

    def log_histogram(self, step: int, name: str, values) -> None:
        """reference DKT.py:196 z_support histogram; JSONL sink stores
        summary statistics rather than raw values."""
        if self._file is None:
            return
        v = np.asarray(values).ravel()
        record = {"step": int(step), "time": time.time(),
                  f"{name}/mean": float(v.mean()), f"{name}/std": float(v.std()),
                  f"{name}/min": float(v.min()), f"{name}/max": float(v.max())}
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            self._tb.add_histogram(name, v, step)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()
