"""Inference wrapper: text -> (waveform, mel, linear).

Rebuild of the reference Synthesizer (reference: neural_speech/synthesizer.py)
on the jitted inference path: autoregressive decode and Griffin-Lim both run
as compiled device programs; only text encoding and endpoint trimming stay
on host. Inputs are padded to a shape bucket so repeated calls reuse the
compiled program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import Config
from nspeech_tpu import dsp
from nspeech_tpu.data.feeder import round_up
from nspeech_tpu.models import create_model
from nspeech_tpu.text import text_to_sequence
from nspeech_tpu.text.symbols import PAD_ID


class Synthesizer:
    def __init__(self, cfg: Config, text_bucket: int = 32):
        self.cfg = cfg
        self.model = None
        self._params = None
        self._bn_state = None
        self._cleaners = [x.strip() for x in cfg.cleaners.split(",")]
        self._text_bucket = text_bucket
        self._forward = None

    def load(self, checkpoint_dir: str, model_name: str,
             step: Optional[int] = None) -> "Synthesizer":
        """Restore parameters from an Orbax checkpoint directory (latest step
        unless ``step`` is given)."""
        from nspeech_tpu.train import (
            CheckpointManager, create_state, make_optimizer)

        self.model = create_model(model_name, self.cfg)
        tx, _ = make_optimizer(self.cfg, model_name)
        template = jax.eval_shape(
            lambda: create_state(self.model, tx, jax.random.PRNGKey(0)))
        mgr = CheckpointManager(checkpoint_dir)
        state = mgr.restore(template, step=step)
        mgr.close()
        self.set_variables(state.params, state.bn_state)
        return self

    def set_variables(self, params, bn_state, model=None) -> "Synthesizer":
        """Use in-memory parameters (e.g. straight from training). Pass
        ``model`` when load() was not called (it normally builds it)."""
        if model is not None:
            self.model = model
        if self.model is None:
            raise ValueError("No model: pass model= or call load() first")
        self._params = params
        self._bn_state = bn_state

        def forward(text, lengths, speaker_ids, key):
            outputs, _ = self.model.forward(
                self._params, self._bn_state, text, lengths,
                speaker_ids=speaker_ids, is_training=False)
            wav = dsp.inv_spectrogram(outputs["linear_outputs"][0], self.cfg,
                                      key=key)
            return (wav, outputs["mel_outputs"][0],
                    outputs["linear_outputs"][0], outputs["alignments"][0])

        self._forward = jax.jit(forward)
        return self

    def synthesize(self, text: str, speaker_id: int = -1
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (waveform float32, mel [T,M], linear [T,F])."""
        if self._forward is None:
            raise RuntimeError("Synthesizer.load() or set_variables() first")
        seq = text_to_sequence(text, self._cleaners)
        padded_len = round_up(len(seq), self._text_bucket)
        ids = np.full((1, padded_len), PAD_ID, np.int32)
        ids[0, : len(seq)] = seq
        lengths = np.asarray([len(seq)], np.int32)
        spk = np.asarray([max(speaker_id, 0)], np.int32)
        wav, mel, lin, align = self._forward(
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(spk),
            jax.random.PRNGKey(0))
        wav = np.asarray(dsp.inv_preemphasis(wav, self.cfg.preemphasis))
        wav = wav[: dsp.find_endpoint(wav, self.cfg)]
        self.last_alignment = np.asarray(align)
        return wav, np.asarray(mel), np.asarray(lin)
