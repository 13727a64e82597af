"""Metrics logging.

Equivalent of madrona_learn's TensorboardWriter + buffered io_callback
metrics flush (reference scripts/jax_train.py:299-361). Writes TensorBoard
events when torch's writer is available (torch-cpu is in the image),
always mirrors scalars to a JSONL file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}
            )
            + "\n"
        )

    def scalars(self, metrics: Dict[str, float], step: int, prefix: str = ""):
        for k, v in metrics.items():
            self.scalar(prefix + k, v, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
