"""Misc utilities (reference: neural_speech/utils/__init__.py)."""

from __future__ import annotations

import subprocess
import time
from datetime import datetime

from nspeech_tpu.utils.infolog import log  # noqa: F401


class ValueWindow:
    """Sliding window average (sec/step, loss smoothing)."""

    def __init__(self, window_size: int = 100):
        self._window_size = window_size
        self._values: list = []

    def append(self, x) -> None:
        self._values = self._values[-(self._window_size - 1):] + [x]

    @property
    def sum(self):
        return sum(self._values)

    @property
    def count(self) -> int:
        return len(self._values)

    @property
    def average(self):
        return self.sum / max(1, self.count)

    def reset(self) -> None:
        self._values = []


def get_git_commit() -> str:
    subprocess.check_output(["git", "diff-index", "--quiet", "HEAD"])
    commit = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()[:10]
    log("Git commit: %s" % commit)
    return commit


def time_string() -> str:
    return datetime.now().strftime("%Y-%m-%d %H:%M")


def timeit(method):
    def timed(*args, **kw):
        ts = time.time()
        result = method(*args, **kw)
        te = time.time()
        if "log_time" in kw:
            name = kw.get("log_name", method.__name__.upper())
            kw["log_time"][name] = int((te - ts) * 1000)
        else:
            print("%r  %2.2f ms" % (method.__name__, (te - ts) * 1000))
        return result

    return timed
