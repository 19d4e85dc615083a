"""Metrics logging.

Parity: the reference logs scalars via TensorBoard SummaryWriter into a
W&B-synced dir (experiments/vargp.py:44-67).  Here: an always-available
JSONL writer (one line per scalar) plus optional TensorBoard mirroring if
torch's SummaryWriter is importable.  No hard wandb/tensorboard deps.
"""

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int = 0) -> None:
        rec = dict(tag=tag, value=float(value), step=int(step), time=time.time())
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
