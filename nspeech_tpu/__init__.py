"""nspeech_tpu — a TPU-native JAX speech-synthesis framework.

A ground-up rebuild of the capabilities of MLCogUP/nspeech (Tacotron-1,
Tacotron-2, WaveNet TTS + vocoder stack) designed for TPU hardware:

- All compute paths are functional JAX traced under ``jax.jit`` and compiled
  by XLA; recurrences are ``lax.scan`` step functions, not Python loops.
- DSP (STFT, mel filterbank, Griffin-Lim, mu-law) is implemented as pure
  ``jax.numpy`` so feature extraction and waveform inversion run fused on
  device (replacing the reference's librosa/scipy host path,
  reference: neural_speech/utils/audio.py).
- Parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding from
  day one; a single chip is the degenerate 1-device mesh.
- Autoregressive WaveNet sampling is a single on-device dispatch
  (``lax.scan`` ring-buffer generator and a Pallas fast kernel), replacing
  the reference's one-session-run-per-sample loop
  (reference: generate_wavenet.py:109-122).
"""

__version__ = "0.1.0"

from nspeech_tpu.config import Config, load_config  # noqa: F401
