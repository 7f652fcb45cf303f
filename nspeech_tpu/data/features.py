"""Per-utterance feature extraction with an on-disk cache.

Behavioral equivalent of the reference's ``process_utterance``
(reference: neural_speech/datasets/process.py:23-36) — load, trim, linear +
mel spectrograms — but the STFT/mel math runs as one fused jitted program
(nspeech_tpu.dsp) and results are cached as .npz files in a configurable
cache directory (replacing the reference's unbounded in-RAM memo plus
hardcoded /cache joblib dump, datafeeder.py:171-176, train.py:121-125).
"""

from __future__ import annotations

import hashlib
import os
from concurrent.futures import ProcessPoolExecutor
from functools import partial
from typing import NamedTuple, Optional

import numpy as np

from nspeech_tpu.config import Config
from nspeech_tpu import dsp


class Utterance(NamedTuple):
    utt_id: str
    wav: np.ndarray           # trimmed waveform, float32 [-1, 1]
    linear: np.ndarray        # [T, num_freq] normalized dB spectrogram
    mel: np.ndarray           # [T, num_mels]
    n_frames: int


def _cache_path(cache_dir: str, wav_path: str, cfg: Config) -> str:
    # Every input that changes the feature values must be in the key — the
    # feature hparams, and the wav file's identity (mtime+size, so a
    # replaced or re-trimmed wav does not silently reuse stale features).
    st = os.stat(wav_path)
    key = "%s|%d|%d|%d|%d|%d|%g|%g|%g|%g|%g" % (
        os.path.abspath(wav_path), st.st_mtime_ns, st.st_size,
        cfg.sample_rate, cfg.num_freq,
        cfg.num_mels, cfg.frame_shift_ms, cfg.frame_length_ms,
        cfg.preemphasis, cfg.ref_level_db, cfg.min_level_db,
    )
    digest = hashlib.sha1(key.encode()).hexdigest()[:20]
    return os.path.join(cache_dir, digest + ".npz")


def _host_cpu_device():
    """Host CPU device for input-pipeline featurization, or None when the
    process was configured without a cpu backend (e.g. --platform tpu /
    JAX_PLATFORMS=tpu) — then featurization runs on the default device."""
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def process_utterance(
    wav_path: str,
    cfg: Config,
    cache_dir: Optional[str] = None,
) -> Utterance:
    """Load, trim, and featurize one utterance (optionally cached)."""
    utt_id = os.path.splitext(os.path.basename(wav_path))[0]

    if cache_dir:
        path = _cache_path(cache_dir, wav_path, cfg)
        if os.path.exists(path):
            with np.load(path) as z:
                return Utterance(utt_id, z["wav"], z["linear"], z["mel"],
                                 int(z["linear"].shape[0]))

    import jax

    from nspeech_tpu import native

    wav = dsp.trim_wav(native.load_wav(wav_path, cfg.sample_rate))
    # Featurization is INPUT-PIPELINE work: pin it to the host CPU backend
    # so it neither occupies the accelerator nor (on remote-compiled
    # setups) stalls first batches for minutes compiling per-bucket STFT
    # programs through the relay. The fused jnp featurizer still runs
    # compiled — just on the CPU client.
    with jax.default_device(_host_cpu_device()):
        linear, mel = dsp.spectrograms(wav, cfg)
        linear = np.asarray(linear)
        mel = np.asarray(mel)

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp.%d.npz" % os.getpid()  # np.savez appends .npz otherwise
        np.savez(tmp, wav=wav, linear=linear, mel=mel)
        os.replace(tmp, path)

    return Utterance(utt_id, wav, linear, mel, linear.shape[0])


def build_from_paths(
    wav_paths,
    cfg: Config,
    cache_dir: Optional[str] = None,
    num_workers: int = 1,
):
    """Offline parallel feature build (reference: process.py:11-18).

    Workers are spawned (not forked): the parent usually has a live XLA
    client, and forking its threads can deadlock the children.
    """
    if num_workers <= 1:
        return [process_utterance(p, cfg, cache_dir) for p in wav_paths]
    import multiprocessing as mp

    with ProcessPoolExecutor(max_workers=num_workers,
                             mp_context=mp.get_context("spawn"),
                             initializer=_feature_worker_init) as ex:
        futures = [ex.submit(partial(process_utterance, p, cfg, cache_dir))
                   for p in wav_paths]
        return [f.result() for f in futures]


def _feature_worker_init() -> None:
    # Featurization is host-side work: keep the workers off the accelerator
    # (they would otherwise contend for the single TPU chip).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
