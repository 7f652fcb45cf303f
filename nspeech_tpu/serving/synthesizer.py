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
    def __init__(self, cfg: Config, text_bucket: int = 32, mesh=None):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a ``data`` axis.
        When given, batched synthesis shards the (padded) request batch over
        the mesh's data axis — parameters are replicated, each device decodes
        its rows, and XLA GSPMD inserts the one collective the decode
        while_loop needs (the all-finished reduction). The reference serves
        single-GPU only (reference: synthesizer.py); this is the
        TPU-native scale-out path for batch serving."""
        self.cfg = cfg
        self.model = None
        self._params = None
        self._bn_state = None
        self._cleaners = [x.strip() for x in cfg.cleaners.split(",")]
        self._text_bucket = text_bucket
        self._forward = None
        self._mesh = mesh

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str,
                        model_name: Optional[str] = None,
                        overrides: str = "",
                        step: Optional[int] = None,
                        text_bucket: int = 32, mesh=None) -> "Synthesizer":
        """Build a Synthesizer entirely from a checkpoint's persisted run
        metadata (exact training-time hparams incl. the mutated
        num_speakers — no manual --num-speakers/--hparams hand-off), with
        optional ``k=v,...`` overrides applied last."""
        from nspeech_tpu.train import config_from_checkpoint

        cfg, name = config_from_checkpoint(checkpoint_dir, model_name,
                                           overrides)
        return cls(cfg, text_bucket=text_bucket, mesh=mesh).load(
            checkpoint_dir, name, step=step)

    def load(self, checkpoint_dir: str, model_name: Optional[str] = None,
             step: Optional[int] = None) -> "Synthesizer":
        """Restore parameters from an Orbax checkpoint directory (latest step
        unless ``step`` is given). ``model_name`` defaults to the persisted
        run metadata's model."""
        from nspeech_tpu.train import load_run_metadata, load_serving_params

        if model_name is None:
            meta = load_run_metadata(checkpoint_dir)
            if meta is None or "model" not in meta:
                raise ValueError(
                    "model_name not given and no run metadata at %r"
                    % checkpoint_dir)
            model_name = meta["model"]
        self.model = create_model(model_name, self.cfg)
        params, bn_state = load_serving_params(
            checkpoint_dir, self.model, self.cfg, model_name, step=step)
        self.set_variables(params, bn_state)
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
            """Batched decode + per-item Griffin-Lim (vmapped), one program.
            inv_preemphasis runs INSIDE the program: eagerly it would
            re-trace its associative_scan on every request (~150 ms of
            host time per call, measured through the relay)."""
            outputs, _ = self.model.forward(
                self._params, self._bn_state, text, lengths,
                speaker_ids=speaker_ids, is_training=False)
            keys = jax.random.split(key, text.shape[0])
            coef = float(self.cfg.preemphasis)
            wavs = jax.vmap(
                lambda lin, k: dsp.inv_preemphasis(
                    dsp.inv_spectrogram(lin, self.cfg, key=k), coef)
            )(outputs["linear_outputs"], keys)
            return (wavs, outputs["mel_outputs"], outputs["linear_outputs"],
                    outputs["alignments"],
                    outputs.get("decoder_steps", lengths))

        if self._mesh is not None:
            from nspeech_tpu.parallel.mesh import (batch_sharding, replicate,
                                                   replicated)

            # Replicate weights once at load; every output of the forward is
            # batch-leading, so one batch sharding covers inputs and outputs.
            self._params = replicate(self._params, self._mesh)
            self._bn_state = replicate(self._bn_state, self._mesh)
            bs, rep = batch_sharding(self._mesh), replicated(self._mesh)
            self._forward = jax.jit(
                forward,
                in_shardings=(bs, bs, bs, rep),
                out_shardings=(bs, bs, bs, bs, bs))
        else:
            self._forward = jax.jit(forward)
        return self

    def synthesize(self, text: str, speaker_id: int = -1,
                   want_features=True
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (waveform float32, mel [T,M], linear [T,F]).
        ``want_features=False`` skips the mel/linear device->host pulls
        (returns None for both); ``"mel"`` pulls the mel but skips the
        full-resolution linear — the wav-only/vocoder serving routes
        save the dominant per-request transfer on a remote-relay chip."""
        wavs, mels, lins = self.synthesize_batch(
            [text], [speaker_id], want_features=want_features)
        return (wavs[0], mels[0] if mels is not None else None,
                lins[0] if lins is not None else None)

    def synthesize_batch(self, texts, speaker_ids=None,
                         want_features=True):
        """Batch synthesis: one padded forward + vmapped Griffin-Lim for N
        texts. Returns (list of waveforms, mels [N,T,M], linears [N,T,F]);
        the feature arrays are None with ``want_features=False``, and the
        linear alone is None with ``want_features="mel"`` (skipped
        pulls)."""
        if self._forward is None:
            raise RuntimeError("Synthesizer.load() or set_variables() first")
        if speaker_ids is None:
            speaker_ids = [-1] * len(texts)
        seqs = [text_to_sequence(t, self._cleaners) for t in texts]
        padded_len = round_up(max(len(s) for s in seqs), self._text_bucket)
        # Pad the batch axis to a power of two so serving compiles a small
        # bounded set of programs across request sizes.
        n = max(1, 1 << (len(seqs) - 1).bit_length())
        if self._mesh is not None:
            # Sharded batches must split evenly over the data axis. Padding
            # rows start finished (length 0) so the extra rows are free.
            dsize = self._mesh.shape.get("data", 1)
            n = ((n + dsize - 1) // dsize) * dsize
        ids = np.full((n, padded_len), PAD_ID, np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
        # Padding rows get length 0: the decoder marks them finished at t=0
        # so they never keep the batch's while_loop running past the point
        # where every real utterance has stopped.
        lengths = np.zeros((n,), np.int32)
        lengths[: len(seqs)] = [len(s) for s in seqs]
        spk = np.zeros((n,), np.int32)
        spk[: len(seqs)] = [max(s, 0) for s in speaker_ids]
        wavs, mels, lins, aligns, dec_steps = self._forward(
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(spk),
            jax.random.PRNGKey(0))
        self.last_alignment = np.asarray(aligns[0])
        self.last_decoder_steps = int(np.asarray(dec_steps)[0])
        out_wavs = []
        for i in range(len(texts)):  # drop batch-padding rows
            wav = np.asarray(wavs[i])   # inv_preemphasis ran in-program
            out_wavs.append(wav[: dsp.find_endpoint(wav, self.cfg)])
        if not want_features:
            return out_wavs, None, None
        if want_features == "mel":
            return out_wavs, np.asarray(mels[: len(texts)]), None
        return (out_wavs, np.asarray(mels[: len(texts)]),
                np.asarray(lins[: len(texts)]))
