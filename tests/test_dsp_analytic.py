"""Analytic DSP fixtures (VERDICT r2 #7): expected values derived BY HAND
from closed forms in the test body — not from numpy.fft, librosa, or the
library under test — so a systematic error shared by the implementation
and its same-author oracle cannot hide.

Closed forms used:
- Slaney mel scale: mel(f) = f / (200/3) for f < 1 kHz;
  mel(1000 * 6.4^(k/27)) = 15 + k  (published piecewise definition,
  reference consumer: neural_speech/utils/audio.py:145-147).
- Triangular filterbank in the linear region: corner frequencies equally
  spaced in Hz, peak weight = 2/bandwidth (Slaney area norm), row sum =
  (sum of sampled triangle) * 2/bandwidth.
- Real DFT: X[k] = sum_n x[n] (cos - i sin)(2*pi*k*n/N);
  impulse -> re = 1 at every bin; cos(2*pi*m*n/N) -> N/2 at bin m only.
- Pre-emphasis y[n] = x[n] - a*x[n-1] on a constant signal -> first
  sample 1, rest (1-a).
- mu-law endpoints: f(+-1) = +-1, f(0) = 0 => codes 255 / 0 / midpoint.
"""

import numpy as np
import pytest

from nspeech_tpu.dsp import mel as melmod

pytestmark = pytest.mark.smoke


def test_mel_scale_closed_form_points():
    # Linear region: mel = f * 3/200
    assert melmod.hz_to_mel(0.0) == 0.0
    np.testing.assert_allclose(melmod.hz_to_mel(500.0), 7.5, rtol=1e-12)
    np.testing.assert_allclose(melmod.hz_to_mel(1000.0), 15.0, rtol=1e-12)
    # Log region: f = 1000 * 6.4^((m-15)/27) => mel(6400) = 42
    np.testing.assert_allclose(melmod.hz_to_mel(6400.0), 42.0, rtol=1e-12)
    np.testing.assert_allclose(melmod.mel_to_hz(42.0), 6400.0, rtol=1e-12)
    np.testing.assert_allclose(melmod.mel_to_hz(15.0 + 13.5),
                               1000.0 * np.sqrt(6.4), rtol=1e-12)
    # round trip at arbitrary points
    f = np.array([123.0, 999.0, 1001.0, 5000.0, 9999.0])
    np.testing.assert_allclose(melmod.mel_to_hz(melmod.hz_to_mel(f)), f,
                               rtol=1e-10)


def test_mel_filterbank_linear_region_geometry():
    """sr=8000, n_fft=64 -> FFT bins every 125 Hz. fmin=0, fmax=1000 with
    n_mels=3 stays in the linear mel region, so the 5 corner frequencies
    are EXACTLY 0, 250, 500, 750, 1000 Hz and every triangle has base
    500 Hz, peak 2/500, and row sum (0.5+1+0.5) * 2/500."""
    fb = melmod.mel_filterbank(8000, 64, 3, fmin=0.0, fmax=1000.0)
    assert fb.shape == (3, 33)
    enorm = 2.0 / 500.0
    centers_bins = [2, 4, 6]  # 250, 500, 750 Hz at 125 Hz/bin
    for i, cb in enumerate(centers_bins):
        np.testing.assert_allclose(fb[i, cb], enorm, rtol=1e-6)
        # half-height at the bins halfway up each slope
        np.testing.assert_allclose(fb[i, cb - 1], 0.5 * enorm, rtol=1e-6)
        np.testing.assert_allclose(fb[i, cb + 1], 0.5 * enorm, rtol=1e-6)
        # zero at and beyond the triangle corners
        assert fb[i, cb - 2] == 0.0 and fb[i, cb + 2] == 0.0
        np.testing.assert_allclose(fb[i].sum(), 2.0 * enorm, rtol=1e-6)


def test_rdft_bases_impulse_and_tone_closed_form():
    from nspeech_tpu.dsp.audio import _rdft_bases

    N = 16
    K = N // 2 + 1
    fwd, inv = _rdft_bases(N)

    # impulse at n=0: X[k] = 1 + 0i for every k
    x = np.zeros(N, np.float32)
    x[0] = 1.0
    ri = x @ fwd
    np.testing.assert_allclose(ri[:K], np.ones(K), atol=1e-6)
    np.testing.assert_allclose(ri[K:], np.zeros(K), atol=1e-6)

    # pure tone cos(2*pi*3n/N): X[3] = N/2, all other bins 0
    n = np.arange(N)
    tone = np.cos(2 * np.pi * 3 * n / N).astype(np.float32)
    ri = tone @ fwd
    expected_re = np.zeros(K)
    expected_re[3] = N / 2.0
    np.testing.assert_allclose(ri[:K], expected_re, atol=1e-5)
    np.testing.assert_allclose(ri[K:], np.zeros(K), atol=1e-5)

    # inverse of the bin-3 coefficient pair reproduces (2/N)*cos scaling:
    # irfft([0,0,0,N/2,0,...]) = cos(2*pi*3n/N)
    coef = np.zeros(2 * K, np.float32)
    coef[3] = N / 2.0
    np.testing.assert_allclose(coef @ inv, tone, atol=1e-5)

    # Parseval on a random vector: sum|X|^2 with hermitian weights == N*sum x^2
    rng = np.random.default_rng(3)
    x = rng.standard_normal(N).astype(np.float32)
    ri = x @ fwd
    w = np.full(K, 2.0)
    w[0] = w[-1] = 1.0
    energy = np.sum(w * (ri[:K] ** 2 + ri[K:] ** 2))
    np.testing.assert_allclose(energy, N * np.sum(x ** 2), rtol=1e-4)


def test_preemphasis_constant_signal_closed_form():
    import jax

    from nspeech_tpu import dsp

    a = 0.97
    x = np.ones(10, np.float32)
    y = np.asarray(dsp.preemphasis(x, a))
    np.testing.assert_allclose(y[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(y[1:], np.full(9, 1.0 - a), atol=1e-6)
    # inverse undoes it exactly: y_inv[n] = sum_{k<=n} a^(n-k) y[k]
    back = np.asarray(dsp.inv_preemphasis(y, a))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_mulaw_endpoints_and_symmetry_closed_form():
    from nspeech_tpu.dsp.mulaw import mu_law_decode, mu_law_encode

    q = 256
    mu = q - 1
    codes = np.asarray(mu_law_encode(np.array([-1.0, 0.0, 1.0]), q))
    # closed form: c = round((sign(x) ln(1+mu|x|)/ln(1+mu) + 1)/2 * mu)
    assert codes[0] == 0 and codes[2] == q - 1
    assert codes[1] == q // 2  # s=0 -> mu/2 + 0.5 = 128.0 -> 128
    # companding is odd: codes of +-x mirror around mu, except exactly at
    # quantization ties (x=0 maps to 128, its mirror to 127) where the
    # reference's round-half-up breaks the symmetry by one code
    xs = np.linspace(-0.9, 0.9, 19)
    c = np.asarray(mu_law_encode(xs, q))
    assert np.all(np.abs((c + c[::-1]) - mu) <= 1)
    # monotone non-decreasing in x
    assert np.all(np.diff(c) >= 0)
    # a hand-computed interior point: x = 15/255 gives
    # ln(1 + 255*15/255)/ln(256) = ln(16)/ln(256) = 1/2 exactly,
    # so c = round((0.5+1)/2 * 255) = round(191.25 + eps) = 191
    assert int(mu_law_encode(np.array([15.0 / 255.0]), q)[0]) == 191
    # decode closed form: t = 2c/mu - 1, x = sign(t)((1+mu)^|t| - 1)/mu
    t = 2 * c / mu - 1
    expected = np.sign(t) * ((1 + mu) ** np.abs(t) - 1) / mu
    np.testing.assert_allclose(np.asarray(mu_law_decode(c, q)), expected,
                               atol=1e-6)
