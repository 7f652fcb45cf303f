"""Native host data loader with transparent build + fallback.

Tries, in order: an already-built ``_loader`` extension, building it once
from the bundled C++ source (g++ via setuptools, cached next to the
source), and finally the pure scipy implementations in nspeech_tpu.dsp.
``AVAILABLE`` reports which path is active.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(__file__)
AVAILABLE = False
_ext = None


def _ext_path() -> str:
    import sysconfig

    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, "_loader" + suffix)


def _drop_stale() -> None:
    """Remove a built extension older than its source, so edits to
    _loader.cpp rebuild transparently on next import."""
    so = _ext_path()
    src = os.path.join(_HERE, "_loader.cpp")
    try:
        if os.path.exists(so) and os.path.getmtime(src) > os.path.getmtime(so):
            os.remove(so)
    except OSError:
        pass


def _try_import() -> bool:
    global _ext, AVAILABLE
    try:
        import importlib

        # importlib (not `from ... import`) so the module attribute `_ext`
        # can never shadow the compiled submodule.
        mod = importlib.import_module("nspeech_tpu.native._loader")
        _ext = mod
        AVAILABLE = True
        return True
    except ImportError:
        return False


def build(verbose: bool = False) -> bool:
    """Compile the extension in place. Returns success."""
    global AVAILABLE
    if _try_import():
        return True
    try:
        import subprocess
        import sysconfig

        import numpy as np

        src = os.path.join(_HERE, "_loader.cpp")
        out = _ext_path()
        include_py = sysconfig.get_paths()["include"]
        include_np = np.get_include()
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-I" + include_py, "-I" + include_np,
            src, "-o", out,
        ]
        result = subprocess.run(cmd, capture_output=True, text=True)
        if result.returncode != 0:
            if verbose:
                print(result.stderr, file=sys.stderr)
            return False
        return _try_import()
    except Exception:
        return False


_drop_stale()
_try_import() or build()


def load_wav(path: str, sample_rate: int):
    """Mono float32 waveform at sample_rate; native when available.

    Decodes WAV (PCM 8/16/24/32 + float32) and FLAC (LibriSpeech-style
    corpora) — dispatch is on the file's magic bytes, not its extension.
    """
    if AVAILABLE:
        wav, _sr = _ext.load_wav(path, sample_rate)
        return wav
    from nspeech_tpu.dsp.wavio import load_wav as py_load

    return py_load(path, sample_rate)


def rms_frames(x, frame_length: int, hop_length: int):
    if AVAILABLE:
        return _ext.rms_frames(x, frame_length, hop_length)
    from nspeech_tpu.dsp.trim import _rms_frames

    return _rms_frames(x, frame_length, hop_length)
