"""End-to-end text -> waveform synthesis: Tacotron mels -> WaveNet vocoder.

This is the pipeline the reference could not run: its WaveNet generator
ignored local conditioning entirely (reference: wavenet.py:398; SURVEY.md
§2.2 note (c)), so text->waveform via WaveNet was impossible. Here the
acoustic model's mel output is upsampled to sample rate and drives the
mel-conditioned WaveNet generator (lax.scan path, which supports lc),
replacing Griffin-Lim as the vocoder.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import Config, stft_params
from nspeech_tpu import dsp
from nspeech_tpu.serving.synthesizer import Synthesizer


# Shipping the FRAME-rate mel and upsampling on device keeps the
# host->device transfer ~hop times smaller — the upsampled array is
# ~2.5KB/sample/stream, which would dominate wall-clock on a thin link.
from nspeech_tpu.ops.upsample import upsample_on_device as _upsample_on_device


class WaveNetVocoder:
    """Mel spectrogram [T, M] -> waveform via mel-conditioned WaveNet.

    Uses the VMEM-resident Pallas kernel (faster than real time on a v5e
    chip) when the model shape supports it; falls back to the lax.scan
    generator otherwise."""

    def __init__(self, cfg: Config, use_pallas: bool = True):
        self.cfg = cfg
        self.net = None
        self._params = None
        self._use_pallas = use_pallas
        self._pallas_gen = None
        self._pallas_gc = None  # gc_ids the cached generator was packed with
        _, self._hop, _ = stft_params(cfg)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str,
                        model_name: Optional[str] = None,
                        overrides: str = "",
                        step: Optional[int] = None,
                        use_pallas: bool = True) -> "WaveNetVocoder":
        """Build a vocoder from the checkpoint's persisted run metadata
        (exact training-time hparams incl. lc/gc channels and the mutated
        gc_category_cardinality), with ``k=v,...`` overrides applied
        last."""
        from nspeech_tpu.train import config_from_checkpoint

        cfg, name = config_from_checkpoint(checkpoint_dir, model_name,
                                           overrides,
                                           default_model="wavenet")
        return cls(cfg, use_pallas=use_pallas).load(checkpoint_dir, name,
                                                    step=step)

    def load(self, checkpoint_dir: str, model_name: str = "wavenet",
             step: Optional[int] = None) -> "WaveNetVocoder":
        from nspeech_tpu.models import create_model
        from nspeech_tpu.train import load_serving_params

        self.net = create_model(model_name, self.cfg)
        self._params, _ = load_serving_params(
            checkpoint_dir, self.net, self.cfg, model_name, step=step)
        return self

    def set_variables(self, net, params) -> "WaveNetVocoder":
        self.net = net
        self._params = params
        return self

    def vocode(self, mel: np.ndarray, speaker_id: Optional[int] = None,
               temperature: float = 1.0, seed: int = 0) -> np.ndarray:
        """mel: [T_frames, M] normalized mel -> float waveform."""
        wavs = self.vocode_batch(
            np.asarray(mel)[None],
            None if speaker_id is None else [speaker_id],
            temperature=temperature, seed=seed)
        return wavs[0]

    def vocode_batch(self, mels: np.ndarray, speaker_ids=None,
                     temperature: float = 1.0, seed: int = 0) -> np.ndarray:
        """mels: [N, T_frames, M] (equal lengths; pad upstream) -> [N, T*hop]
        waveforms. All N streams share one Pallas sampling chain (batch on
        the sublane dim costs barely more than one stream)."""
        if self.net.lc_channels <= 0:
            raise ValueError(
                "Vocoder checkpoint was trained without local conditioning "
                "(lc_channels=0); it cannot follow a mel spectrogram.")
        mels = np.asarray(mels)
        n = mels.shape[0]
        n_samples = mels.shape[1] * self._hop
        # ship the small frame-rate mel; upsample to sample rate ON device
        lc = _upsample_on_device(jnp.asarray(mels, jnp.float32),
                                 self._hop, n_samples)   # [N, T*hop, M]
        gc_ids = None
        if speaker_ids is not None and self.net.gc_channels:
            gc_ids = np.asarray(speaker_ids, np.int32)

        codes = None
        if self._use_pallas and jax.default_backend() not in ("cpu",):
            try:
                # The generator folds gc into its packed biases, so it must
                # be rebuilt when the requested speakers change.
                gc_key = None if gc_ids is None else tuple(np.asarray(gc_ids))
                if self._pallas_gen is None or self._pallas_gc != gc_key:
                    from nspeech_tpu.ops.pallas.wavenet_gen import (
                        PallasWaveNetGenerator)

                    self._pallas_gen = PallasWaveNetGenerator(
                        self.net, self._params, gc_ids=gc_ids)
                    self._pallas_gc = gc_key
                codes = self._pallas_gen(n_samples, seed=seed, batch=n,
                                         lc=lc, temperature=temperature)
            except (NotImplementedError, ValueError):
                # unsupported model shape or backend: use the scan path
                self._use_pallas = False
                codes = None
        if codes is None:
            codes = self.net.generate(
                self._params, n_samples, jax.random.PRNGKey(seed), batch=n,
                gc_ids=gc_ids, lc=lc, temperature=temperature)
        return np.asarray(dsp.mu_law_decode(codes,
                                            self.net.quantization_channels))


class TextToSpeech:
    """Full pipeline: text -> (Tacotron) mel -> (WaveNet | Griffin-Lim) wav."""

    def __init__(self, synthesizer: Synthesizer,
                 vocoder: Optional[WaveNetVocoder] = None):
        self.synthesizer = synthesizer
        self.vocoder = vocoder

    @property
    def cfg(self):
        """The acoustic model's config (sample_rate etc. for callers that
        treat the pipeline as a drop-in Synthesizer)."""
        return self.synthesizer.cfg

    def synthesize(self, text: str, speaker_id: int = -1,
                   temperature: float = 1.0, return_gl: bool = False,
                   want_features=True):
        """Returns (wav, mel, lin), or (wav, mel, lin, wav_gl) with
        ``return_gl`` — the Griffin-Lim waveform is computed either way
        (its endpoint trims the vocoder input), so asking for it is
        free. ``want_features=False`` skips the full-resolution linear
        pull (lin comes back None); the mel is always pulled — the
        vocoder consumes it."""
        wav_gl, mel, lin = self.synthesizer.synthesize(
            text, speaker_id,
            want_features=True if want_features else "mel")
        if self.vocoder is None:
            return ((wav_gl, mel, lin, wav_gl) if return_gl
                    else (wav_gl, mel, lin))
        # The decoder always runs to max_iters, so the raw mel carries
        # trailing post-stop frames. The Griffin-Lim waveform is already
        # endpoint-trimmed (synthesizer.synthesize_batch), so its length
        # tells us how many frames carry speech — vocode only those.
        n_frames = int(np.ceil(len(wav_gl) / self.vocoder._hop))
        mel_trimmed = mel[: max(n_frames, 1)]
        wav = self.vocoder.vocode(
            mel_trimmed, speaker_id if speaker_id >= 0 else None,
            temperature=temperature)
        wav = wav[: dsp.find_endpoint(wav, self.synthesizer.cfg)]
        return (wav, mel, lin, wav_gl) if return_gl else (wav, mel, lin)

    def synthesize_batch(self, texts, speaker_ids=None,
                         temperature: float = 1.0):
        """Batch pipeline: one padded acoustic forward + ONE batched
        vocoder chain for N texts. Returns (wavs list, mels, linears)."""
        wavs_gl, mels, lins = self.synthesizer.synthesize_batch(
            texts, speaker_ids)
        if self.vocoder is None:
            return wavs_gl, mels, lins
        hop = self.vocoder._hop
        # Vocode up to the longest speech-bearing frame (per-stream trim
        # after), so all streams share one fixed-shape kernel call.
        frames = [max(int(np.ceil(len(w) / hop)), 1) for w in wavs_gl]
        t_max = max(frames)
        # Match the single-utterance path: -1/None means UNCONDITIONED
        # (synthesize() passes gc_ids=None), never an implicit speaker 0.
        # One batched chain packs one gc table, so conditioned and
        # unconditioned streams cannot mix.
        gc = None
        if speaker_ids is not None:
            missing = [s is None or s < 0 for s in speaker_ids]
            if all(missing):
                gc = None
            elif any(missing):
                from nspeech_tpu.serving.errors import ClientError

                raise ClientError(
                    "synthesize_batch: cannot mix explicit speaker_ids and "
                    "-1/None (unconditioned) in one vocoder batch")
            else:
                gc = list(speaker_ids)
        batch_wavs = self.vocoder.vocode_batch(
            mels[:, :t_max], gc, temperature=temperature)
        out = []
        for i, w in enumerate(batch_wavs):
            w = w[: frames[i] * hop]
            out.append(w[: dsp.find_endpoint(w, self.synthesizer.cfg)])
        return out, mels, lins
