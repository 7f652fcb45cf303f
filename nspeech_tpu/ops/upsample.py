"""On-device upsampling of frame-rate conditioning features.

Local conditioning for WaveNet needs per-sample features, but shipping
them host->device costs ``hop_length``x the bandwidth of the frame-rate
mels they interpolate (~33 MB vs ~1 MB per training batch at the default
config). Both serving (serving/pipeline.py) and training
(train/loop.py) therefore transfer FRAME-rate mels and linearly
interpolate on device; the host reference implementation is
``data.wavenet_feeder.upsample_frames`` (np.interp, frame t anchored at
sample t*hop — librosa centered-frame convention), matched here to
float tolerance (tests/test_data.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def upsample_on_device(mels: jnp.ndarray, hop: int, length: int) -> jnp.ndarray:
    """[N, T_frames, M] -> [N, length, M]; anchors at t*hop, edge-held."""
    t_frames = mels.shape[1]
    pos = jnp.arange(length) / hop
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t_frames - 1)
    i1 = jnp.clip(i0 + 1, 0, t_frames - 1)
    w = (pos - i0.astype(jnp.float32))[None, :, None]
    return (jnp.take(mels, i0, axis=1) * (1.0 - w)
            + jnp.take(mels, i1, axis=1) * w)


def upsample_window(mel_frames: jnp.ndarray, phase: jnp.ndarray,
                    hop: int, length: int) -> jnp.ndarray:
    """Per-row phase-aligned window upsample.

    ``mel_frames`` [B, F, M] are the frame rows covering one training
    window (first row anchored ``phase[b]`` samples BEFORE the window
    start, 0 <= phase < hop); returns [B, length, M] per-sample features
    identical to slicing a whole-utterance host upsample at the window
    offset. Positions beyond the last row hold its value (np.interp edge
    semantics).
    """
    f = mel_frames.shape[1]
    j = jnp.arange(length)[None, :]                       # [1, L]
    p = (phase[:, None].astype(jnp.float32) + j) / hop    # [B, L] frame pos
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, f - 1)
    i1 = jnp.clip(i0 + 1, 0, f - 1)
    w = jnp.clip(p - i0.astype(jnp.float32), 0.0, 1.0)[..., None]
    take = jax.vmap(lambda rows, idx: jnp.take(rows, idx, axis=0))
    return take(mel_frames, i0) * (1.0 - w) + take(mel_frames, i1) * w


def batch_lc(batch, cfg) -> jnp.ndarray:
    """Per-sample local conditioning for a ``WaveNetBatch`` in either
    layout: the legacy per-sample ``mel`` passes through unchanged; the
    frame-rate layout (``mel_phase`` set) gets the phase-aligned
    on-device upsample. ``cfg`` supplies the hop length and is required
    only for the frame-rate layout."""
    if getattr(batch, "mel_phase", None) is None:
        return batch.mel
    if cfg is None:
        raise ValueError(
            "batch ships frame-rate mels (mel_phase set) but no cfg was "
            "given to derive hop_length — pass cfg to the step builder")
    from nspeech_tpu.config import stft_params

    _, hop, _ = stft_params(cfg)
    return upsample_window(batch.mel, batch.mel_phase, hop,
                           batch.audio.shape[1])
