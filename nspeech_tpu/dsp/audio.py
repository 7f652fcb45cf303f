"""Signal processing core: STFT, spectrogram features, Griffin-Lim.

TPU-native replacement for the reference's librosa/TF DSP layer
(reference: neural_speech/utils/audio.py). Everything here is pure
``jax.numpy`` on static shapes, so the whole wav -> (linear, mel) featurizer
and the iterative Griffin-Lim inversion compile to single fused XLA
programs (FFTs run on-device). Conventions follow librosa so features are
numerically compatible with the reference pipeline:

- hann window of ``win_length`` (periodic), zero-padded centrally to
  ``n_fft``;
- signal reflect-padded by ``n_fft // 2`` on both sides (center=True);
- ISTFT overlap-add normalized by the squared-window envelope.

Config is passed explicitly (the reference read a process-global singleton,
audio.py:9; see SURVEY.md §1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import Config, stft_params
from nspeech_tpu.dsp.mel import mel_filterbank


# -----------------------------------------------------------------------------
# Windows and framing
# -----------------------------------------------------------------------------

def periodic_hann(win_length: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window, as used by librosa/scipy fftbins=True."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _padded_window(n_fft: int, win_length: int) -> np.ndarray:
    """Hann(win_length) zero-padded centrally to n_fft (librosa pad_center)."""
    window = periodic_hann(win_length)
    lpad = (n_fft - win_length) // 2
    return np.pad(window, (lpad, n_fft - win_length - lpad)).astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop_length: int) -> int:
    """Frame count for a center-padded signal of n_samples."""
    return 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop_length


def _frame(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """[T] -> [n_frames, n_fft] frames of the center-padded signal."""
    pad = n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    n = 1 + (y.shape[0] - n_fft) // hop_length
    idx = jnp.arange(n)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    return y[idx]


# -----------------------------------------------------------------------------
# STFT / ISTFT
# -----------------------------------------------------------------------------

def stft(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int) -> jnp.ndarray:
    """Complex STFT, shape [n_frames, 1 + n_fft//2] (time-major)."""
    window = jnp.asarray(_padded_window(n_fft, win_length))
    frames = _frame(y.astype(jnp.float32), n_fft, hop_length)
    return jnp.fft.rfft(frames * window[None, :], axis=-1)


def istft(
    stft_matrix: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with squared-window overlap-add normalization.

    ``stft_matrix`` is time-major [n_frames, 1 + n_fft//2]. Output trims the
    ``n_fft // 2`` centering pad from both ends, matching librosa.istft.
    """
    window = jnp.asarray(_padded_window(n_fft, win_length))
    frames = jnp.fft.irfft(stft_matrix, n=n_fft, axis=-1) * window[None, :]

    n = frames.shape[0]
    total = n_fft + hop_length * (n - 1)
    # Overlap-add via scatter-add of all frames at their hop offsets.
    idx = jnp.arange(n)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    y = jnp.zeros(total, dtype=frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    wss = jnp.zeros(total, dtype=frames.dtype).at[idx.reshape(-1)].add(
        jnp.tile(window * window, n)
    )
    y = y / jnp.maximum(wss, 1e-10)

    pad = n_fft // 2
    y = y[pad: total - pad]
    if length is not None:
        y = y[:length]
    return y


# -----------------------------------------------------------------------------
# Pre-emphasis
# -----------------------------------------------------------------------------

def preemphasis(x: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[n] = x[n] - coef * x[n-1] (FIR; first sample passes through)."""
    x = jnp.asarray(x)
    return jnp.concatenate([x[:1], x[1:] - coef * x[:-1]])


def inv_preemphasis(x: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Inverse filter y[n] = x[n] + coef * y[n-1].

    First-order IIR expressed as an associative scan (log-depth on TPU
    instead of a length-T sequential loop).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    a = jnp.full_like(x, coef)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, b2 + a2 * b1

    _, y = jax.lax.associative_scan(combine, (a, x))
    return y


# -----------------------------------------------------------------------------
# dB / normalization helpers (reference: audio.py:150-171)
# -----------------------------------------------------------------------------

def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize(S: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    return jnp.clip((S - min_level_db) / -min_level_db, 0.0, 1.0)


def denormalize(S: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    return jnp.clip(S, 0.0, 1.0) * -min_level_db + min_level_db


# -----------------------------------------------------------------------------
# Featurizer: wav -> (linear, mel) spectrograms
# -----------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "win_length", "num_mels", "sample_rate",
        "ref_level_db", "min_level_db",
    ),
)
def _featurize_padded(
    y_padded: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    num_mels: int,
    sample_rate: int,
    ref_level_db: float,
    min_level_db: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused features on an ALREADY center-padded signal (no further
    padding; frames straight off the array). Input lengths are coarse
    buckets, so the whole corpus compiles a handful of programs instead of
    one per wav length."""
    mel_basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, num_mels))
    window = jnp.asarray(_padded_window(n_fft, win_length))
    n = 1 + (y_padded.shape[0] - n_fft) // hop_length
    idx = jnp.arange(n)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = y_padded[idx] * window[None, :]
    mag = jnp.abs(jnp.fft.rfft(frames, axis=-1))               # [T, F]
    linear = normalize(amp_to_db(mag) - ref_level_db, -abs(min_level_db))
    mel = normalize(amp_to_db(mag @ mel_basis.T), -abs(min_level_db))
    return linear.astype(jnp.float32), mel.astype(jnp.float32)


FEATURIZE_BUCKET = 16384  # padded-signal length granularity (~0.8 s @ 20 kHz)


def spectrograms(y, cfg: Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear + mel spectrograms (time-major) with the reference's dB scaling
    and [0,1] normalization (reference: audio.py:39-64). One fused device
    program (per coarse length bucket) replaces the host librosa path.

    Exactness under bucketing: preemphasis and the librosa-style reflect
    centering are applied on the host to the exact-length signal; only
    trailing zeros pad it up to the bucket, and the result is sliced back to
    the true frame count — every kept frame's window lies inside the
    exactly-padded region, so values are bit-identical to the unbucketed
    computation.

    NOTE: the reference normalizes with ``min_level_db`` read as a *positive*
    100 but used as -100 dB floor (audio.py:163 divides by the negated
    value); this function takes the config value and applies the identical
    arithmetic.
    """
    n_fft, hop_length, win_length = stft_params(cfg)
    y = np.asarray(y, dtype=np.float32)
    emph = np.concatenate([y[:1], y[1:] - cfg.preemphasis * y[:-1]])
    pad = n_fft // 2
    # numpy reflect needs pad < len; degenerate tiny inputs fall back to
    # zero padding (librosa would reject them outright).
    mode = "reflect" if emph.shape[0] > pad else "constant"
    exact = np.pad(emph, (pad, pad), mode=mode)
    n_frames = 1 + (exact.shape[0] - n_fft) // hop_length
    bucket_len = -(-exact.shape[0] // FEATURIZE_BUCKET) * FEATURIZE_BUCKET
    padded = np.pad(exact, (0, bucket_len - exact.shape[0]))
    linear, mel = _featurize_padded(
        jnp.asarray(padded),
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        num_mels=cfg.num_mels,
        sample_rate=cfg.sample_rate,
        ref_level_db=cfg.ref_level_db,
        min_level_db=cfg.min_level_db,
    )
    return linear[:n_frames], mel[:n_frames]


def spectrogram(y, cfg: Config) -> jnp.ndarray:
    return spectrograms(y, cfg)[0]


def melspectrogram(y, cfg: Config) -> jnp.ndarray:
    return spectrograms(y, cfg)[1]


# -----------------------------------------------------------------------------
# Griffin-Lim inversion (reference: audio.py:45-58,77-103)
# -----------------------------------------------------------------------------

# -- TPU fast path: matmul real-DFT + collision-free overlap-add -----------
#
# XLA's TPU FFT lowering and the colliding scatter-add overlap-add in
# :func:`istft` are serial and slow; 60 Griffin-Lim iterations through them
# cost seconds per utterance. On TPU the DFT is instead expressed as two
# MXU matmuls against precomputed cos/sin bases (real arithmetic only; no
# complex64), and overlap-add exploits that frames >= ceil(n_fft/hop)
# apart never overlap, so the scatter becomes ceil(n_fft/hop) dense
# shifted adds. The CPU path keeps np.fft-based :func:`stft`/:func:`istft`
# (faster there, and the featurizer/golden contract is untouched).

@functools.lru_cache(maxsize=None)
def _rdft_bases(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """(forward [n_fft, 2K], inverse [2K, n_fft]) real-DFT bases, K bins.

    forward: [re | im] = (frame @ fwd) matches np.fft.rfft;
    inverse: frame = [re | im] @ inv matches np.fft.irfft.
    """
    K = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(K, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    C, S = np.cos(ang), -np.sin(ang)
    fwd = np.concatenate([C, S], axis=1).astype(np.float32)
    w = np.full(K, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    inv = np.concatenate([(C * w / n_fft).T, (S * w / n_fft).T],
                         axis=0).astype(np.float32)
    return fwd, inv


@functools.lru_cache(maxsize=None)
def _wss_np(n_fft: int, hop_length: int, win_length: int,
            n_frames: int) -> np.ndarray:
    """Squared-window overlap-add normalizer (constant per config)."""
    w2 = _padded_window(n_fft, win_length).astype(np.float64) ** 2
    total = n_fft + hop_length * (n_frames - 1)
    wss = np.zeros(total)
    for i in range(n_frames):
        wss[i * hop_length: i * hop_length + n_fft] += w2
    return np.maximum(wss, 1e-10).astype(np.float32)


def _rdft_bases_traced(n_fft: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same bases as :func:`_rdft_bases`, built from iota INSIDE the trace
    so the jitted program carries a few cheap ops instead of ~33MB of
    inline f32 literals (which inflate XLA compile time)."""
    K = n_fft // 2 + 1
    n = jnp.arange(n_fft, dtype=jnp.float32)[:, None]
    k = jnp.arange(K, dtype=jnp.float32)[None, :]
    ang = (2.0 * jnp.pi / n_fft) * n * k
    C, Sn = jnp.cos(ang), -jnp.sin(ang)
    fwd = jnp.concatenate([C, Sn], axis=1)              # [n_fft, 2K]
    w = jnp.full((K,), 2.0).at[0].set(1.0)
    if n_fft % 2 == 0:
        w = w.at[-1].set(1.0)
    inv = jnp.concatenate([(C * w / n_fft).T, (Sn * w / n_fft).T], axis=0)
    return fwd, inv


def _grouped_stft_ops(n_fft: int, hop_length: int, win_length: int,
                      n_frames: int):
    """Build the residue-grouped analysis/synthesis pair used by the TPU
    Griffin-Lim loop.

    Frames J = ceil(n_fft/hop) apart never overlap, so with frames kept in
    RESIDUE-GROUPED order (frames j, j+J, j+2J, ... contiguous) both
    framing and overlap-add are dense slice/reshape/add chains — no
    gathers anywhere in the hot loop. Returns ``(regroup, to_wav,
    from_wav)`` where ``regroup`` maps natural frame order [F, ...] to
    grouped order; ``to_wav`` maps grouped (re, im) bins to the
    squared-window-normalized padded-domain signal; ``from_wav`` maps a
    padded-domain signal back to grouped (re, im) bins. Tested directly
    against the scatter-add :func:`istft` oracle (test_dsp.py).
    """
    fwd, inv = _rdft_bases_traced(n_fft)
    window = jnp.asarray(_padded_window(n_fft, win_length))
    K = n_fft // 2 + 1
    wss = jnp.asarray(_wss_np(n_fft, hop_length, win_length, n_frames))
    # Precision.DEFAULT: single-pass MXU matmuls; Griffin-Lim phase
    # estimation is itself approximate, and reconstruction quality is
    # unchanged at bf16 matmul precision (spectral-peak test).
    P = jax.lax.Precision.DEFAULT
    J = -(-n_fft // hop_length)
    group_sizes = [len(range(j, n_frames, J)) for j in range(J)]
    offsets = np.concatenate([[0], np.cumsum(group_sizes)[:-1]]).astype(int)
    total = n_fft + hop_length * (n_frames - 1)    # padded signal length
    span = J * hop_length                          # per-frame stride slot

    def regroup(rows):
        return jnp.concatenate([rows[j::J] for j in range(J)], axis=0)

    def to_wav(re_g, im_g):
        """grouped (re, im) -> padded-signal waveform (center pad kept)."""
        frames_t = jnp.dot(jnp.concatenate([re_g, im_g], axis=1), inv,
                           precision=P) * window[None, :]
        y = jnp.zeros((total + span,), frames_t.dtype)
        for j in range(J):
            fj = group_sizes[j]
            if fj == 0:
                continue
            sub = frames_t[int(offsets[j]): int(offsets[j]) + fj]
            flat = jnp.pad(sub, ((0, 0), (0, span - n_fft))).reshape(-1)
            flat = jnp.pad(flat, (j * hop_length,
                                  y.shape[0] - j * hop_length - flat.size))
            y = y + flat
        return y[:total] / wss

    def from_wav(y):
        """padded-signal waveform -> grouped (re, im).

        Operates on the PADDED domain; the Griffin-Lim loop re-imposes
        the reflect center-padding between iterations (see
        _griffin_lim_matmul), so edge frames see a fresh reflection just
        like the fft path — while the framing itself stays a gather-free
        slice/reshape chain."""
        yp = jnp.pad(y, (0, span * (max(group_sizes) + 1)))
        groups = []
        for j in range(J):
            fj = group_sizes[j]
            if fj == 0:
                continue
            region = jax.lax.dynamic_slice(yp, (j * hop_length,),
                                           (fj * span,))
            groups.append(region.reshape(fj, span)[:, :n_fft])
        frames = jnp.concatenate(groups, axis=0) * window[None, :]
        ri = jnp.dot(frames, fwd, precision=P)
        return ri[:, :K], ri[:, K:]

    return regroup, to_wav, from_wav


def _gl_iterate(project, y0, iters: int, momentum: float):
    """Run ``iters`` Griffin-Lim projections from ``y0``.

    With ``momentum`` > 0 this is the fast-Griffin-Lim update (Perraudin
    et al. 2013): each step projects the extrapolated signal
    ``t_n + momentum * (t_n - t_{n-1})`` and the PROJECTED iterate is
    returned (the extrapolation only seeds the next projection). At 0.0
    it reduces to the plain iteration, bit-identically. Shared by the
    matmul-DFT and FFT/scatter paths so the update rule cannot drift."""
    if momentum:
        def body(_, carry):
            c, t_prev = carry
            t = project(c)
            return t + momentum * (t - t_prev), t

        return jax.lax.fori_loop(0, iters, body, (y0, y0))[1]
    return jax.lax.fori_loop(0, iters, lambda _, y: project(y), y0)


def _griffin_lim_matmul(S: jnp.ndarray, key, n_fft: int, hop_length: int,
                        win_length: int, iters: int,
                        momentum: float = 0.0) -> jnp.ndarray:
    """Griffin-Lim on the matmul-DFT path; S is the |amplitude| [T, K].

    ``momentum`` > 0 is the fast-Griffin-Lim extrapolation (Perraudin et
    al. 2013): each iterate projects the extrapolated signal
    ``t_n + momentum * (t_n - t_{n-1})`` instead of ``t_n``; at 0.0 the
    update is bit-identical to plain Griffin-Lim."""
    n_frames, K = S.shape
    pad = n_fft // 2
    total = n_fft + hop_length * (n_frames - 1)
    regroup, to_wav, from_wav = _grouped_stft_ops(
        n_fft, hop_length, win_length, n_frames)

    # magnitude rows regrouped ONCE, outside the loop
    S_g = regroup(S)

    theta = 2.0 * jnp.pi * jax.random.uniform(key, S_g.shape)
    y = to_wav(S_g * jnp.cos(theta), S_g * jnp.sin(theta))

    # Re-impose the reflect center-padding every iteration like the
    # FFT path (librosa semantics: trim + re-reflect per iteration).
    # Leaving the overlap-added pad region as-is instead was measured to
    # cost real reconstruction quality on short utterances (spectral
    # error 0.304 vs 0.260 plain, 0.237 vs 0.216 with momentum, at 40
    # iters on a 0.4 s 3-tone signal). Static guard: np-style reflect
    # needs pad <= core_len - 1 (only sub-1s utterances fail it).
    can_reflect = (total - 2 * pad) > pad

    def project(y):
        re, im = from_wav(y)
        mag = jnp.maximum(1e-8, jnp.sqrt(re * re + im * im))
        out = to_wav(S_g * re / mag, S_g * im / mag)
        if can_reflect:
            out = jnp.pad(out[pad: total - pad], pad, mode="reflect")
        return out

    y = _gl_iterate(project, y, iters, momentum)
    return y[pad: total - pad].astype(jnp.float32)   # == istft() trimming


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "win_length", "iters",
        "ref_level_db", "min_level_db", "power", "matmul_dft", "momentum",
    ),
)
def _griffin_lim(
    S_norm: jnp.ndarray,
    key: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    iters: int,
    ref_level_db: float,
    min_level_db: float,
    power: float,
    matmul_dft: bool | None = None,
    momentum: float = 0.0,
) -> jnp.ndarray:
    """Normalized linear spectrogram [T, F] -> waveform via Griffin-Lim.

    The full denormalize -> dB->amp -> power-raise -> iterative phase
    estimation loop compiles to one device program (lax.fori_loop), replacing
    the 60-iteration host loop / in-graph TF loop of the reference.
    """
    S = db_to_amp(denormalize(S_norm, -abs(min_level_db)) + ref_level_db)
    S = jnp.power(S, power)

    if matmul_dft is None:
        matmul_dft = jax.default_backend() not in ("cpu",)
    if matmul_dft:
        return _griffin_lim_matmul(S, key, n_fft, hop_length, win_length,
                                   iters, momentum=momentum)

    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(key, S.shape))
    S_complex = S.astype(jnp.complex64)
    y = istft(S_complex * angles, n_fft, hop_length, win_length)

    def project(y):
        est = stft(y, n_fft, hop_length, win_length)
        angles = est / jnp.maximum(1e-8, jnp.abs(est))
        return istft(S_complex * angles, n_fft, hop_length, win_length)

    return _gl_iterate(project, y, iters, momentum).astype(jnp.float32)


def inv_spectrogram(S_norm, cfg: Config, key=None) -> jnp.ndarray:
    """Waveform from a normalized linear spectrogram [T, F].

    Does NOT invert pre-emphasis (same contract as the reference TF path,
    audio.py:51-58); call :func:`inv_preemphasis` on the result.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n_fft, hop_length, win_length = stft_params(cfg)
    return _griffin_lim(
        jnp.asarray(S_norm, dtype=jnp.float32),
        key,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        iters=cfg.griffin_lim_iters,
        ref_level_db=cfg.ref_level_db,
        min_level_db=cfg.min_level_db,
        power=cfg.power,
        # getattr: run-metadata configs written before this hparam existed
        momentum=float(getattr(cfg, "griffin_lim_momentum", 0.0)),
    )


# -----------------------------------------------------------------------------
# Endpointing (host-side; reference: audio.py:67-74)
# -----------------------------------------------------------------------------

def find_endpoint(wav: np.ndarray, cfg: Config, threshold_db: float = -40.0,
                  min_silence_sec: float = 0.8) -> int:
    window_length = int(cfg.sample_rate * min_silence_sec)
    hop = window_length // 4
    threshold = 10.0 ** (threshold_db * 0.05)
    wav = np.asarray(wav)
    for x in range(hop, len(wav) - window_length, hop):
        if np.max(wav[x: x + window_length]) < threshold:
            return x + hop
    return len(wav)
