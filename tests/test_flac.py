"""FLAC decoding (native/_loader.cpp + dsp/flacio.py fallback).

LibriSpeech-style corpora ship .flac; the reference read them through
librosa/audioread (reference: neural_speech/datasets/corpus/ljspeech.py:17).
This environment has no flac library, so both decoders are implemented
from the spec (RFC 9639) and validated here against a THIRD independently
written implementation — the test encoder in tests/make_flac.py — plus
cross-checked against each other bit-for-bit.
"""

import os

import numpy as np
import pytest

from nspeech_tpu import native
from nspeech_tpu.dsp.flacio import FlacError, decode_flac, load_flac
from tests.make_flac import encode_flac, write_flac

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="native loader unavailable")


def _signal(n, seed=1, scale=2000):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(0, scale, n).cumsum() * 0.02,
                   -32768, 32767).astype(np.int64)


def _expected(samples, bps=16):
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    return (s.mean(axis=1) / (1 << (bps - 1))).astype(np.float32)


# One case per decoder feature: (name, samples-builder kwargs)
MONO = _signal(3000)
STEREO = np.stack(
    [MONO, np.clip(MONO // 2 + _signal(3000, seed=2, scale=40),
                   -32768, 32767)], axis=1)
CASES = [
    ("fixed_o0", MONO, dict(fixed_order=0)),
    ("fixed_o4_partitions", MONO[:2048],
     dict(fixed_order=4, partition_order=3)),
    ("rice2", MONO, dict(method=1)),
    ("escape_partitions", MONO[:1024],
     dict(partition_order=2, escape_partitions=(1, 3))),
    ("verbatim", MONO, dict(kind="verbatim")),
    ("constant", np.full(512, -123, np.int64), dict(kind="constant")),
    ("lpc_o2", MONO, dict(kind="lpc", lpc=([3, -1], 1, 5))),
    ("lpc_o8", MONO,
     dict(kind="lpc", lpc=([20, -12, 6, -3, 2, -1, 1, 0], 4, 7))),
    ("wasted_bits", (MONO // 8) * 8, dict(wasted=3)),
    ("stereo_independent", STEREO, dict()),
    ("left_side", STEREO, dict(stereo_mode="left_side")),
    ("right_side", STEREO, dict(stereo_mode="right_side")),
    ("mid_side", STEREO, dict(stereo_mode="mid_side")),
    ("blocksize_192", MONO, dict(block_size=192)),
    ("blocksize_end8", MONO[:700],
     dict(block_size=100, header_blocksize="end8")),
    ("blocksize_end16", MONO, dict(block_size=1000,
                                   header_blocksize="end16")),
    ("header_from_streaminfo", MONO,
     dict(header_rate="streaminfo", header_size="streaminfo")),
    ("odd_rate_u16_header", MONO, dict()),  # sr=12345 set below
    ("8bit", np.clip(MONO // 256, -128, 127), dict()),
    ("short_tail_block", MONO[:2500], dict(block_size=1024)),
]


@pytest.mark.parametrize("name,samples,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_roundtrip_both_decoders(name, samples, kw, tmp_path):
    sr = 12345 if name == "odd_rate_u16_header" else 16000
    bps = 8 if name == "8bit" else 16
    data = encode_flac(samples, sr, bps=bps, **kw)
    path = str(tmp_path / (name + ".flac"))
    with open(path, "wb") as f:
        f.write(data)
    ref = _expected(samples, bps)
    # native C++ decoder (no resample: target 0)
    wav_c = native.load_wav(path, 0)
    np.testing.assert_array_equal(wav_c, ref)
    # pure-Python fallback decoder
    wav_py, got_sr = decode_flac(data)
    assert got_sr == sr
    np.testing.assert_array_equal(wav_py, ref)


def test_resample_matches_wav_path(tmp_path):
    """A 16 kHz FLAC and the same samples as WAV must resample to the
    configured 20 kHz identically through native.load_wav."""
    from scipy.io import wavfile

    sig = _signal(8000)
    fpath = str(tmp_path / "a.flac")
    write_flac(fpath, sig, 16000)
    wpath = str(tmp_path / "a.wav")
    wavfile.write(wpath, 16000, sig.astype(np.int16))
    f20 = native.load_wav(fpath, 20000)
    w20 = native.load_wav(wpath, 20000)
    np.testing.assert_allclose(f20, w20, atol=1e-6)
    assert len(f20) == 10000
    # ...and the Python fallback resampler agrees closely (scipy kaiser)
    py = load_flac(fpath, 20000)
    assert len(py) == len(f20)
    np.testing.assert_allclose(py, f20, atol=2e-4)


def test_corrupt_and_truncated_rejected(tmp_path):
    sig = _signal(2000)
    data = bytearray(encode_flac(sig, 16000))
    # flip one payload bit -> frame CRC-16 must catch it (both decoders)
    bad = bytearray(data)
    bad[len(bad) // 2] ^= 0x10
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(bad)
    with pytest.raises(OSError, match="CRC"):
        native.load_wav(path, 0)
    with pytest.raises(FlacError, match="CRC"):
        decode_flac(bytes(bad))
    # truncation
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(OSError):
        native.load_wav(path, 0)
    with pytest.raises(FlacError):
        decode_flac(bytes(data[: len(data) // 2]))
    # garbage
    with open(path, "wb") as f:
        f.write(b"fLaCgarbage")
    with pytest.raises(OSError):
        native.load_wav(path, 0)


def test_fuzz_no_crash(tmp_path):
    """Bounded fuzz: random truncations and byte flips of a valid stream
    must either decode or raise a clean error — never crash the process
    (the C++ decoder parses untrusted bytes)."""
    rng = np.random.default_rng(7)
    base = bytearray(encode_flac(_signal(1500), 16000, block_size=256))
    path = str(tmp_path / "fuzz.flac")
    for trial in range(150):
        data = bytearray(base)
        if trial % 3 == 0:  # truncate
            data = data[: rng.integers(4, len(data))]
        flips = rng.integers(1, 6)
        for _ in range(flips):
            data[rng.integers(0, len(data))] ^= 1 << rng.integers(0, 8)
        with open(path, "wb") as f:
            f.write(bytes(data))
        try:
            wav = native.load_wav(path, 0)
            assert np.isfinite(wav).all()
        except OSError:
            pass
        try:
            decode_flac(bytes(data))
        except FlacError:
            pass


def test_librispeech_flac_corpus(tmp_path):
    """End-to-end: a LibriSpeech-layout corpus of .flac files loads
    through the corpus registry, the featurizer, and the feeder."""
    import nspeech_tpu.config as config
    from nspeech_tpu.data.corpus import load_items
    from nspeech_tpu.data.feeder import DataFeeder

    root = tmp_path / "libre"
    os.makedirs(root / "dev" / "84" / "100")
    rows = []
    texts = ["the quick brown fox", "jumps over the lazy dog",
             "pack my box with five dozen jugs", "how vexingly quick"]
    for i, text in enumerate(texts):
        t = np.arange(16000 + 800 * i) / 16000.0
        sig = (9000 * np.sin(2 * np.pi * (150 + 40 * i) * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(np.int64)
        rel = "dev/84/100/84-100-%04d.flac" % i
        write_flac(str(root / rel), sig, 16000, block_size=1024)
        rows.append("84-100-%04d,%s,%s,dev" % (i, rel, text))
    with open(root / "corpus.csv", "w") as f:
        f.write("\n".join(rows) + "\n")

    items = load_items({"librispeech": str(root)})
    assert len(items) == 4 and items[0][3] == "libre"
    wav = native.load_wav(items[0][0], 20000)
    assert len(wav) == 20000 and np.abs(wav).max() > 0.1

    cfg = config.load_config("taco1")
    cfg.parse("batch_size=2,batch_group_size=2")
    feeder = DataFeeder({"librispeech": str(root)}, cfg, seed=0)
    batch = next(feeder.epoch_batches(0))
    assert batch.inputs.shape[0] == 2
    assert np.isfinite(batch.mel_targets).all()
    assert batch.mel_targets.max() > 0


def test_predictor_order_exceeding_blocksize_rejected():
    """A FIXED/LPC subframe whose order exceeds the blocksize must raise
    FlacError (matching _loader.cpp's decode_subframe guard), not an
    IndexError from the warm-up writes."""
    from nspeech_tpu.dsp import flacio

    # bits: pad=0, kind=0b111111 (LPC order 32), wasted=0
    with pytest.raises(FlacError, match="order exceeds"):
        flacio._subframe(flacio._Reader(bytes([0x7E])), bps=16, blocksize=1)
    # bits: pad=0, kind=0b001100 (FIXED order 4), wasted=0
    with pytest.raises(FlacError, match="order exceeds"):
        flacio._subframe(flacio._Reader(bytes([0x18])), bps=16, blocksize=1)


def test_python_decoder_stream_length_cap(monkeypatch):
    """The pure-Python fallback enforces the same decoded-size bound as the
    native decoder, so a small crafted file can't drive unbounded memory
    growth. (Patched low here — the real cap is 2^28 samples.)"""
    from nspeech_tpu.dsp import flacio

    monkeypatch.setattr(flacio, "MAX_STREAM_SAMPLES", 500)
    data = encode_flac(_signal(2000), 16000, block_size=256)
    with pytest.raises(FlacError, match="cap"):
        decode_flac(data)
