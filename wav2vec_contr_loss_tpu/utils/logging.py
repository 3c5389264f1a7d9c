"""Structured training metrics logging.

The reference's only observability is print() lines captured into SLURM
logs (SURVEY.md §5). Here: the same printed one-liners (so logs diff
cleanly), plus optional TensorBoard scalars and a JSONL metrics stream for
programmatic consumption.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 tensorboard: bool = False, print_fn=print):
        self.print_fn = print_fn
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(log_dir)
                except Exception as e:  # TF optional
                    self.print_fn(f"[WARN] TensorBoard unavailable: {e}")

    def log(self, step: int, metrics: Dict, message: Optional[str] = None) -> None:
        if message:
            self.print_fn(message)
        if self._jsonl is not None:
            rec = {"step": step, "time": time.time(), **metrics}
            self._jsonl.write(json.dumps(rec, default=float) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    if isinstance(v, (int, float)) and v == v:  # skip NaN
                        tf.summary.scalar(k, v, step=step)
                self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
