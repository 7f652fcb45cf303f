"""Training metric writers.

Two always-on channels replacing the reference's TensorBoard-only stats
(reference: tacotron.py:158-183): a JSONL metrics stream (machine-readable,
no TF dependency) and, when tensorflow is importable, TensorBoard scalar/
histogram/audio summaries so existing dashboards keep working (the
reference emits output/target histograms at tacotron.py:163-170 and an
audio summary at generate_wavenet.py:163-168).
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
        self._tf = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # optional; resolved once at init

                self._tf = tf
                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            with self._tb.as_default():
                for k, v in values.items():
                    self._tf.summary.scalar(k, float(v), step=int(step))

    def histograms(self, step: int, arrays: Dict[str, "object"]) -> None:
        """TB histograms (outputs/targets/grad norms); JSONL gets summary
        stats so the data survives without tensorflow installed."""
        import numpy as np

        rec = {"step": int(step), "time": time.time()}
        for k, v in arrays.items():
            a = np.asarray(v, dtype=np.float32).ravel()
            if a.size == 0:
                continue
            rec[k + "/mean"] = float(a.mean())
            rec[k + "/std"] = float(a.std())
            rec[k + "/min"] = float(a.min())
            rec[k + "/max"] = float(a.max())
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            with self._tb.as_default():
                for k, v in arrays.items():
                    self._tf.summary.histogram(k, v, step=int(step))

    def audio(self, step: int, tag: str, wav, sample_rate: int) -> None:
        """TB audio summary (no-op without tensorflow — the wav artifact on
        disk is the durable copy either way)."""
        if self._tb is None:
            return
        import numpy as np

        w = np.asarray(wav, dtype=np.float32).reshape(1, -1, 1)
        with self._tb.as_default():
            self._tf.summary.audio(tag, w, sample_rate, step=int(step),
                                   max_outputs=1)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
