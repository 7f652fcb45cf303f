#!/usr/bin/env python
"""Regenerate the frozen DSP/text golden fixtures.

The goldens pin the numerical contract of the feature pipeline
(BASELINE.md: mels within 1e-3 of the TF reference) so that a silent
regression in the DSP implementation — or a drift introduced by a
refactor — fails tests instead of quietly invalidating checkpoints.

Run ONLY when a deliberate, documented change to the DSP contract is made:

    PYTHONPATH=/root/repo python tests/goldens/make_goldens.py

and commit the updated .npz/.json alongside the change that explains why.
"""

import json
import os

import numpy as np


def deterministic_wav(sample_rate: int) -> np.ndarray:
    """1.5 s fixed test signal: two tones + seeded noise burst + silence
    tail (exercises featurize, mu-law, and endpoint paths)."""
    t = np.arange(int(1.5 * sample_rate)) / sample_rate
    wav = 0.4 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 97.0 * t)
    noise = np.random.default_rng(20260816).normal(0.0, 0.05, wav.shape)
    wav = wav + noise
    wav[int(1.2 * sample_rate):] = 0.0  # silence tail
    return np.clip(wav, -1.0, 1.0).astype(np.float32)


GOLDEN_TEXTS = [
    "Hello, world!",
    "Dr. Smith paid $1,234.50 on Dec. 2nd, 1999 -- c'est la vie.",
    "The {AH0 N S IY1 N} word.",
    "100 apples and 2.5 pears",
]


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import nspeech_tpu.config as config
    from nspeech_tpu import dsp
    from nspeech_tpu.text import text_to_sequence

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = config.load_config("taco1")

    wav = deterministic_wav(cfg.sample_rate)
    linear, mel = dsp.spectrograms(wav, cfg)
    mu = dsp.mu_law_encode(wav, 256)
    np.savez_compressed(
        os.path.join(here, "dsp_goldens.npz"),
        wav=wav,
        linear=np.asarray(linear, np.float32),
        mel=np.asarray(mel, np.float32),
        mu_codes=np.asarray(mu, np.int32),
        mu_decoded=np.asarray(dsp.mu_law_decode(mu, 256), np.float32),
        endpoint=np.asarray(dsp.find_endpoint(wav, cfg), np.int64),
    )

    seqs = {t: text_to_sequence(t, ["english_cleaners"]) for t in GOLDEN_TEXTS}
    with open(os.path.join(here, "text_goldens.json"), "w") as f:
        json.dump(seqs, f, indent=1)
    print("wrote goldens to", here)


if __name__ == "__main__":
    main()
