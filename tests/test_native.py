"""Native host loader: decode/resample/RMS must match the scipy/python
implementations (the fallback path) within filter-design tolerance."""

import numpy as np
import pytest
from scipy.io import wavfile
from scipy.signal import resample_poly

from nspeech_tpu import native
from nspeech_tpu.dsp.trim import _rms_frames
from nspeech_tpu.dsp.wavio import load_wav as py_load_wav


@pytest.fixture(scope="module")
def tone_wav(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wav") / "tone.wav")
    sr = 22050
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 2333 * t)).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    return path


def test_native_builds():
    # The extension must build in this environment (g++ is baked in).
    assert native.AVAILABLE, "native loader failed to build"


def test_native_decode_resample_matches_scipy(tone_wav):
    nat = native.load_wav(tone_wav, 20000)
    raw = wavfile.read(tone_wav)[1].astype(np.float32) / 32768.0
    ref = resample_poly(raw, 400, 441).astype(np.float32)
    assert len(nat) == len(ref)
    assert np.abs(nat - ref).max() < 1e-3


def test_native_no_resample(tone_wav):
    nat = native.load_wav(tone_wav, 22050)
    ref = py_load_wav(tone_wav, 22050)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_stereo_and_float(tmp_path):
    sr = 20000
    t = np.arange(sr // 2) / sr
    left = 0.5 * np.sin(2 * np.pi * 300 * t)
    right = 0.1 * np.sin(2 * np.pi * 300 * t)
    stereo = np.stack([left, right], axis=1).astype(np.float32)
    path = str(tmp_path / "stereo.wav")
    wavfile.write(path, sr, stereo)  # float32 wav
    nat = native.load_wav(path, sr)
    np.testing.assert_allclose(nat, (left + right) / 2, atol=1e-6)


def test_native_rms_frames():
    x = np.random.default_rng(0).standard_normal(5000).astype(np.float32)
    a = native.rms_frames(x, 1024, 512)
    b = _rms_frames(x, 1024, 512)
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_native_bad_file(tmp_path):
    path = str(tmp_path / "bad.wav")
    with open(path, "wb") as f:
        f.write(b"not a wav at all")
    if native.AVAILABLE:
        with pytest.raises(IOError):
            native._ext.load_wav(path, 20000)
