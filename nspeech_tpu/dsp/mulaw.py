"""Mu-law companding codec (ITU-T G.711 style).

Same quantization arithmetic as the reference
(reference: neural_speech/models/wavenet.py:800-822), in jnp so it fuses
into the WaveNet input/output paths on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def mu_law_encode(audio: jnp.ndarray, quantization_channels: int) -> jnp.ndarray:
    """float waveform in [-1, 1] -> int32 codes in [0, Q-1]."""
    mu = float(quantization_channels - 1)
    audio = jnp.asarray(audio)
    safe_abs = jnp.minimum(jnp.abs(audio), 1.0)
    magnitude = jnp.log1p(mu * safe_abs) / jnp.log1p(mu)
    signal = jnp.sign(audio) * magnitude
    # Quantize: shift to [0, mu], round half up via +0.5 then truncate.
    return ((signal + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(codes: jnp.ndarray, quantization_channels: int) -> jnp.ndarray:
    """int codes in [0, Q-1] -> float waveform in [-1, 1]."""
    mu = float(quantization_channels - 1)
    signal = 2.0 * (codes.astype(jnp.float32) / mu) - 1.0
    magnitude = (1.0 / mu) * ((1.0 + mu) ** jnp.abs(signal) - 1.0)
    return jnp.sign(signal) * magnitude
