"""Small host-side run utilities.

Behavioral parity targets (reference: neural_speech/utils/__init__.py):
a sliding-window average for step-time/loss smoothing, a clean-tree git
stamp logged at training start, and a human-readable timestamp. Implemented
here in this codebase's own idiom — ring-buffer deque, subprocess.run, ISO
timestamps — and without the reference's unused ``timeit`` decorator.
"""

from __future__ import annotations

import subprocess
from collections import deque
from datetime import datetime

from nspeech_tpu.utils.infolog import log  # noqa: F401


class ValueWindow:
    """Running mean over the most recent ``size`` appended values.

    Used to smooth per-step wall-clock and loss in the training log.
    """

    def __init__(self, size: int = 100):
        self._buf: deque = deque(maxlen=size)

    def append(self, value) -> None:
        self._buf.append(value)

    def reset(self) -> None:
        self._buf.clear()

    @property
    def count(self) -> int:
        return len(self._buf)

    @property
    def sum(self):
        return sum(self._buf)

    @property
    def average(self) -> float:
        return sum(self._buf) / len(self._buf) if self._buf else 0.0


def get_git_commit(require_clean: bool = True) -> str:
    """Short hash of HEAD for stamping runs; refuses a dirty tree by default.

    A run stamped with a commit that doesn't match the code that actually
    ran is worse than no stamp, hence the clean-tree requirement.
    """
    dirty = subprocess.run(
        ["git", "diff-index", "--quiet", "HEAD"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    ).returncode != 0
    if dirty and require_clean:
        raise RuntimeError(
            "working tree has uncommitted changes; commit (or pass "
            "--git=False) before stamping a training run")
    head = subprocess.run(
        ["git", "rev-parse", "--short=10", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    log(f"git commit: {head}" + (" (dirty tree)" if dirty else ""))
    return head


def time_string() -> str:
    """Local wall-clock timestamp for artifact annotations."""
    return datetime.now().isoformat(sep=" ", timespec="seconds")
