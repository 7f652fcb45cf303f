"""DSP layer tests: the jnp fused featurizer is validated against an
independent numpy oracle implementing the librosa conventions step by step
(SURVEY.md §4.1: STFT/mel/normalize goldens), plus signal-processing
property tests (tone peak bins, round trips, Griffin-Lim reconstruction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config, stft_params
from nspeech_tpu import dsp
from nspeech_tpu.dsp.audio import periodic_hann
from nspeech_tpu.dsp.mel import hz_to_mel, mel_filterbank, mel_to_hz


pytestmark = pytest.mark.smoke  # fast contract tests


CFG = load_config("taco1")
N_FFT, HOP, WIN = stft_params(CFG)


# ---------------------------------------------------------------------------
# Independent numpy oracle (deliberately written loop-style, not shared with
# the jnp implementation).
# ---------------------------------------------------------------------------

def oracle_stft(y, n_fft, hop, win):
    window = np.zeros(n_fft)
    h = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    lpad = (n_fft - win) // 2
    window[lpad: lpad + win] = h
    ypad = np.pad(y, n_fft // 2, mode="reflect")
    frames = []
    for start in range(0, len(ypad) - n_fft + 1, hop):
        frames.append(np.fft.rfft(ypad[start: start + n_fft] * window))
    return np.array(frames)


def oracle_preemphasis(x, coef):
    y = np.copy(np.asarray(x, dtype=np.float64))
    y[1:] -= coef * np.asarray(x[:-1], dtype=np.float64)
    return y


def oracle_features(y, cfg):
    n_fft, hop, win = stft_params(cfg)
    mag = np.abs(oracle_stft(oracle_preemphasis(y, cfg.preemphasis), n_fft, hop, win))
    db = 20 * np.log10(np.maximum(1e-5, mag)) - cfg.ref_level_db
    lin = np.clip((db + 100.0) / 100.0, 0, 1)
    basis = mel_filterbank(cfg.sample_rate, n_fft, cfg.num_mels)
    meldb = 20 * np.log10(np.maximum(1e-5, mag @ basis.T)) - 0  # no ref shift? see below
    return lin, mag, basis


def make_tone(freq, sr, seconds=0.5, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------

def test_stft_matches_oracle(rng):
    y = rng.standard_normal(4096).astype(np.float32)
    ours = np.asarray(dsp.stft(y, N_FFT, HOP, WIN))
    ref = oracle_stft(y, N_FFT, HOP, WIN)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_tone_peak_bin():
    sr = CFG.sample_rate
    freq = 1000.0
    y = make_tone(freq, sr)
    mag = np.abs(np.asarray(dsp.stft(y, N_FFT, HOP, WIN)))
    peak_bin = int(np.argmax(mag[mag.shape[0] // 2]))
    expected = round(freq * N_FFT / sr)
    assert abs(peak_bin - expected) <= 1


def test_istft_round_trip(rng):
    y = rng.standard_normal(8000).astype(np.float32)
    S = dsp.stft(y, N_FFT, HOP, WIN)
    y2 = np.asarray(dsp.istft(S, N_FFT, HOP, WIN, length=len(y)))
    # Interior must reconstruct nearly exactly (hann + hop=win/4 satisfies COLA).
    np.testing.assert_allclose(y2[N_FFT: -N_FFT], y[N_FFT: -N_FFT], atol=1e-3)


def test_preemphasis_round_trip(rng):
    y = rng.standard_normal(5000).astype(np.float32)
    emph = dsp.preemphasis(y, 0.97)
    np.testing.assert_allclose(np.asarray(emph), oracle_preemphasis(y, 0.97), atol=1e-5)
    back = np.asarray(dsp.inv_preemphasis(emph, 0.97))
    np.testing.assert_allclose(back, y, atol=1e-3)


# ---------------------------------------------------------------------------
# Mel filterbank
# ---------------------------------------------------------------------------

def test_mel_scale_round_trip():
    freqs = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 10000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(freqs)), freqs, rtol=1e-6, atol=1e-6)
    # Slaney scale: linear below 1 kHz at 3/200 mel per Hz.
    np.testing.assert_allclose(hz_to_mel(200.0), 3.0, rtol=1e-9)
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-9)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(CFG.sample_rate, N_FFT, CFG.num_mels)
    assert fb.shape == (80, 1025)
    assert np.all(fb >= 0)
    # Every filter is nonzero and unimodal in the pass band.
    assert np.all(fb.max(axis=1) > 0)
    # Interior FFT bins are covered by at least one filter.
    coverage = fb.sum(axis=0)
    assert np.all(coverage[10:-1] > 0)
    # Slaney normalization: peak of each triangle ~ 2 / bandwidth.
    from nspeech_tpu.dsp.mel import mel_frequencies
    corners = mel_frequencies(82, 0.0, CFG.sample_rate / 2)
    widths = corners[2:] - corners[:-2]
    # wide filters (high freq) have small peaks, narrow have large
    peaks = fb.max(axis=1)
    ratio = peaks * widths / 2.0
    assert np.all(ratio < 1.05) and np.median(ratio) > 0.5


def test_melspectrogram_matches_matmul_oracle(rng):
    y = rng.standard_normal(6000).astype(np.float32)
    lin, mel = dsp.spectrograms(y, CFG)
    lin, mel = np.asarray(lin), np.asarray(mel)
    assert lin.shape[1] == 1025 and mel.shape[1] == 80
    assert lin.shape[0] == mel.shape[0]
    assert lin.min() >= 0 and lin.max() <= 1
    # Oracle linear spectrogram
    mag = np.abs(oracle_stft(oracle_preemphasis(y, 0.97), N_FFT, HOP, WIN))
    db = 20 * np.log10(np.maximum(1e-5, mag)) - CFG.ref_level_db
    lin_ref = np.clip((db + 100.0) / 100.0, 0, 1)
    np.testing.assert_allclose(lin, lin_ref, atol=1e-3)
    # Oracle mel (note: mel path subtracts ref_level_db via the same formula)
    basis = mel_filterbank(CFG.sample_rate, N_FFT, CFG.num_mels)
    meldb = 20 * np.log10(np.maximum(1e-5, mag @ basis.T))
    mel_ref = np.clip((meldb + 100.0) / 100.0, 0, 1)
    np.testing.assert_allclose(mel, mel_ref, atol=1e-3)


# ---------------------------------------------------------------------------
# Griffin-Lim
# ---------------------------------------------------------------------------

def test_griffin_lim_reconstructs_tone():
    cfg = CFG.replace(griffin_lim_iters=30)
    y = make_tone(440.0, cfg.sample_rate, seconds=0.4)
    lin, _ = dsp.spectrograms(y, cfg)
    wav = np.asarray(dsp.inv_spectrogram(lin, cfg))
    wav = np.asarray(dsp.inv_preemphasis(wav, cfg.preemphasis))
    # The reconstruction should be dominated by the same tone: check the
    # spectrum peak lands on 440 Hz.
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    peak_freq = np.argmax(spec) * cfg.sample_rate / len(wav)
    assert abs(peak_freq - 440.0) < 15.0


@pytest.mark.parametrize("matmul_dft,iters", [(False, 8), (True, 40)])
def test_griffin_lim_momentum_converges_further(matmul_dft, iters):
    """Fast Griffin-Lim (griffin_lim_momentum > 0) must reach a lower
    spectral-convergence error than the plain iteration at the same
    iteration count, on BOTH the FFT/scatter and the matmul-DFT (TPU)
    paths; momentum=0.0 keeps the parity default. The matmul path is
    checked at more iterations: its (documented) padded-domain boundary
    deviation dominates the error early, so the momentum separation
    emerges later (measured: 3%% at 8 iters, 22%% at 40)."""
    from nspeech_tpu.config import stft_params
    from nspeech_tpu.dsp.audio import (_griffin_lim, db_to_amp, denormalize,
                                       stft)

    cfg = CFG
    sr = cfg.sample_rate
    t = np.arange(int(0.4 * sr)) / sr
    y = sum(a * np.sin(2 * np.pi * f * t)
            for a, f in [(0.5, 220.0), (0.3, 547.0), (0.2, 1290.0)])
    lin, _ = dsp.spectrograms(np.asarray(y, np.float32), cfg)
    n_fft, hop, win = stft_params(cfg)
    S = np.asarray(db_to_amp(
        denormalize(jnp.asarray(lin, jnp.float32), -abs(cfg.min_level_db))
        + cfg.ref_level_db)) ** cfg.power

    def spectral_err(momentum):
        wav = _griffin_lim(
            jnp.asarray(lin, jnp.float32), jax.random.PRNGKey(3),
            n_fft=n_fft, hop_length=hop, win_length=win, iters=iters,
            ref_level_db=cfg.ref_level_db, min_level_db=cfg.min_level_db,
            power=cfg.power, matmul_dft=matmul_dft, momentum=momentum)
        est = np.abs(np.asarray(stft(wav, n_fft, hop, win)))
        return float(np.linalg.norm(est - S) / np.linalg.norm(S))

    e_plain, e_fast = spectral_err(0.0), spectral_err(0.99)
    assert e_fast < 0.9 * e_plain, (e_plain, e_fast)


# ---------------------------------------------------------------------------
# Mu-law
# ---------------------------------------------------------------------------

def test_mu_law_range_and_inverse(rng):
    x = np.clip(rng.standard_normal(2000) * 0.4, -1, 1).astype(np.float32)
    codes = np.asarray(dsp.mu_law_encode(x, 256))
    assert codes.min() >= 0 and codes.max() <= 255
    decoded = np.asarray(dsp.mu_law_decode(codes, 256))
    # Companded 8-bit quantization error is small for moderate amplitudes.
    assert np.max(np.abs(decoded - x)) < 0.05
    # Endpoints map to extreme codes.
    assert int(np.asarray(dsp.mu_law_encode(np.array(1.0), 256))) == 255
    assert int(np.asarray(dsp.mu_law_encode(np.array(-1.0), 256))) == 0
    # (0+1)/2*255 + 0.5 = 128 with the reference's arithmetic (wavenet.py:811)
    assert int(np.asarray(dsp.mu_law_encode(np.array(0.0), 256))) == 128


def test_mu_law_monotonic():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    codes = np.asarray(dsp.mu_law_encode(x, 256))
    assert np.all(np.diff(codes) >= 0)


# ---------------------------------------------------------------------------
# Trimming / wav io
# ---------------------------------------------------------------------------

def test_trim_wav_removes_silence():
    sr = CFG.sample_rate
    sil = np.zeros(sr // 2, dtype=np.float32)
    tone = make_tone(440, sr, 0.5)
    wav = np.concatenate([sil, tone, sil])
    trimmed = dsp.trim_wav(wav)
    assert len(trimmed) < len(wav)
    assert len(trimmed) >= len(tone)
    assert np.max(np.abs(trimmed)) > 0.4


def test_trim_silence_all_silent():
    wav = np.zeros(5000, dtype=np.float32)
    assert dsp.trim_silence(wav, 0.1).size == 0


def test_wav_io_round_trip(tmp_path, rng):
    sr = 20000
    wav = np.clip(rng.standard_normal(sr) * 0.3, -1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    dsp.save_wav(wav, path, sr)
    loaded = dsp.load_wav(path, sr)
    assert loaded.shape == wav.shape
    # save_wav peak-normalizes; compare up to scale.
    scale = np.max(np.abs(wav))
    np.testing.assert_allclose(loaded * scale, wav, atol=2e-3)


def test_wav_io_resample(tmp_path):
    sr_in, sr_out = 22050, 20000
    t = np.arange(sr_in) / sr_in
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "r.wav")
    dsp.save_wav(wav, path, sr_in)
    loaded = dsp.load_wav(path, sr_out)
    assert abs(len(loaded) - sr_out) <= 2
    spec = np.abs(np.fft.rfft(loaded))
    peak = np.argmax(spec) * sr_out / len(loaded)
    assert abs(peak - 440.0) < 5.0


def test_find_endpoint():
    sr = CFG.sample_rate
    tone = make_tone(440, sr, 0.5)
    wav = np.concatenate([tone, np.zeros(sr * 2, dtype=np.float32)])
    end = dsp.find_endpoint(wav, CFG)
    assert len(tone) * 0.5 < end < len(tone) + sr


# ---------------------------------------------------------------------------
# Matmul-DFT Griffin-Lim fast path (TPU serving; FFT stays on CPU)
# ---------------------------------------------------------------------------

def test_rdft_bases_match_numpy_fft(rng):
    from nspeech_tpu.dsp.audio import _rdft_bases

    n_fft = 256
    fwd, inv = _rdft_bases(n_fft)
    x = rng.standard_normal((5, n_fft)).astype(np.float32)
    ri = x @ fwd
    K = n_fft // 2 + 1
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(ri[:, :K], ref.real, atol=1e-3)
    np.testing.assert_allclose(ri[:, K:], ref.imag, atol=1e-3)
    # inverse round-trips
    back = ri @ inv
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_grouped_stft_ops_match_scatter_oracle(rng):
    """The PRODUCTION Griffin-Lim synthesis/analysis pair (residue-grouped
    dense overlap-add) matches a straightforward numpy scatter-add oracle —
    the same ops `_griffin_lim_matmul` runs every iteration."""
    from nspeech_tpu.dsp.audio import (
        _grouped_stft_ops, _padded_window, _wss_np)

    F, n_fft, hop, win = 11, 64, 9, 50   # non-divisible hop -> residues
    K = n_fft // 2 + 1
    J = -(-n_fft // hop)
    regroup, to_wav, from_wav = _grouped_stft_ops(n_fft, hop, win, F)
    natural = [i for j in range(J) for i in range(j, F, J)]  # grouped order
    window = _padded_window(n_fft, win)
    total = n_fft + hop * (F - 1)

    # synthesis: grouped (re, im) -> normalized overlap-add
    re = rng.standard_normal((F, K)).astype(np.float32)
    im = rng.standard_normal((F, K)).astype(np.float32)
    im[:, 0] = 0.0
    im[:, -1] = 0.0
    ours = np.asarray(to_wav(regroup(jnp.asarray(re)),
                             regroup(jnp.asarray(im))))
    ref = np.zeros(total, np.float64)
    for i in range(F):
        frame = np.fft.irfft(re[i] + 1j * im[i], n=n_fft) * window
        ref[i * hop: i * hop + n_fft] += frame
    ref /= _wss_np(n_fft, hop, win, F)
    np.testing.assert_allclose(ours, ref, atol=2e-3)

    # analysis: padded-domain signal -> grouped windowed rfft per frame
    y = rng.standard_normal(total).astype(np.float32)
    re_g, im_g = (np.asarray(a) for a in from_wav(jnp.asarray(y)))
    for g, i in enumerate(natural):
        frame = np.zeros(n_fft)
        avail = min(n_fft, total - i * hop)
        frame[:avail] = y[i * hop: i * hop + avail]
        bins = np.fft.rfft(frame * window)
        np.testing.assert_allclose(re_g[g], bins.real, atol=2e-3)
        np.testing.assert_allclose(im_g[g], bins.imag, atol=2e-3)


def test_griffin_lim_matmul_reconstructs_tone():
    from nspeech_tpu.config import stft_params
    from nspeech_tpu.dsp.audio import _griffin_lim

    cfg = CFG.replace(griffin_lim_iters=30)
    y = make_tone(440.0, cfg.sample_rate, seconds=0.4)
    lin, _ = dsp.spectrograms(y, cfg)
    n_fft, hop, win = stft_params(cfg)
    wav = np.asarray(_griffin_lim(
        jnp.asarray(lin, jnp.float32), jax.random.PRNGKey(0),
        n_fft=n_fft, hop_length=hop, win_length=win,
        iters=cfg.griffin_lim_iters, ref_level_db=cfg.ref_level_db,
        min_level_db=cfg.min_level_db, power=cfg.power, matmul_dft=True))
    wav = np.asarray(dsp.inv_preemphasis(wav, cfg.preemphasis))
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    peak_freq = np.argmax(spec) * cfg.sample_rate / len(wav)
    assert abs(peak_freq - 440.0) < 15.0
