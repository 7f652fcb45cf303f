"""Training metric writers.

Two always-on channels replacing the reference's TensorBoard-only stats
(reference: tacotron.py:158-183): a JSONL metrics stream (machine-readable,
no TF dependency) and, when tensorflow is importable, TensorBoard scalar
summaries so existing dashboards keep working.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # lazy, optional

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
