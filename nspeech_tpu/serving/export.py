"""AOT serving export: serialize the compiled text -> waveform program.

Packages the Synthesizer's whole jitted forward (autoregressive decode +
postnet/expand + vmapped Griffin-Lim) as a serialized StableHLO module
with the trained weights baked in as constants (``jax.export``). The
resulting artifact directory is self-contained for serving:

- ``module.stablehlo`` — the serialized compiled program (weights inside)
- ``export.json``     — the handful of host-side constants the loader
                        needs (text cleaners, preemphasis, sample rate,
                        static input shapes)

``ExportedSynthesizer`` loads it WITHOUT the model zoo, the checkpoint,
or the training config — only the text frontend and the tiny host-side
wav post-processing (preemphasis inversion + endpoint trim) run in
Python. Export can target multiple platforms at once (``platforms=
("cpu", "tpu")``) so one artifact serves both a dev box and a TPU host.

The reference has no counterpart (its Synthesizer re-built the TF graph
from hparams at load time, neural_speech/synthesizer.py); this is the
TPU-native deployment story: serving hosts ship an opaque compiled
program, not model code.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax import export as jax_export

MODULE_FILE = "module.stablehlo"
META_FILE = "export.json"
VOC_MODULE_FILE = "vocoder.stablehlo"
VOC_META_FILE = "vocoder.json"


def export_synthesizer(
    synth,
    out_dir: str,
    text_len: int = 64,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export ``synth`` (a loaded Synthesizer) for (batch, text_len)
    inputs. Shapes are static by design — serving pads to them, exactly
    like the live Synthesizer's shape buckets. Returns ``out_dir``.

    ``platforms`` defaults to the current backend; pass e.g.
    ``("cpu", "tpu")`` to lower for both in one artifact.
    """
    if synth._forward is None:
        raise ValueError("Synthesizer must be loaded before export")
    args = (
        jnp.zeros((batch, text_len), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        jax.random.PRNGKey(0),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(synth._forward, **kwargs)(*args)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, MODULE_FILE), "wb") as f:
        f.write(exported.serialize())
    cfg = synth.cfg
    meta = {
        "batch": batch,
        "text_len": text_len,
        "platforms": list(exported.platforms),
        "cleaners": cfg.cleaners,
        "preemphasis": float(cfg.preemphasis),
        # the exported program already applies inv_preemphasis (the
        # synthesizer fused it in-program); loaders must not re-apply
        "preemphasis_in_program": True,
        "sample_rate": int(cfg.sample_rate),
        # endpoint trim constants (dsp.find_endpoint's inputs)
        "min_silence_sec": 0.8,
        "silence_threshold_db": -40.0,
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def export_vocoder(
    vocoder,
    out_dir: str,
    frames: int,
    batch: int = 1,
    temperature: float = 1.0,
    gc_ids: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export a loaded WaveNetVocoder as (mel [N, frames, M], key) ->
    waveform [N, frames*hop], via the portable lax.scan generator (the
    Pallas kernel stays the live-serving fast path on TPU; the exported
    artifact favors deploy-anywhere portability). Mel upsampling to
    sample rate and mu-law decoding run INSIDE the compiled program.

    Sampling temperature and (when the net was trained with global
    conditioning) ``gc_ids`` are baked in at export time; the rng key
    stays a call argument.
    """
    from nspeech_tpu.dsp import mu_law_decode
    from nspeech_tpu.ops.upsample import upsample_on_device

    net, params = vocoder.net, vocoder._params
    if net is None or params is None:
        raise ValueError("Vocoder must be loaded before export")
    if net.lc_channels <= 0:
        raise ValueError("Vocoder was trained without local conditioning "
                         "(lc_channels=0); it cannot follow a mel")
    hop = vocoder._hop
    n_samples = frames * hop
    gc = None
    if gc_ids is not None:
        if not net.gc_channels:
            raise ValueError("gc_ids given but the net has gc_channels=0")
        gc = np.asarray(gc_ids, np.int32)

    def fn(mels, key):
        lc = upsample_on_device(mels, hop, n_samples)
        codes = net.generate(params, n_samples, key, batch=batch,
                             gc_ids=gc, lc=lc, temperature=temperature)
        return mu_law_decode(codes, net.quantization_channels)

    args = (jnp.zeros((batch, frames, net.lc_channels), jnp.float32),
            jax.random.PRNGKey(0))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(fn), **kwargs)(*args)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, VOC_MODULE_FILE), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "batch": batch,
        "frames": frames,
        "hop": hop,
        "num_mels": int(net.lc_channels),
        "temperature": float(temperature),
        "gc_ids": None if gc is None else [int(i) for i in gc],
        "platforms": list(exported.platforms),
        "sample_rate": int(vocoder.cfg.sample_rate),
    }
    with open(os.path.join(out_dir, VOC_META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ExportedVocoder:
    """Serve mel -> waveform from an export_vocoder() artifact."""

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, VOC_META_FILE)) as f:
            self.meta = json.load(f)
        with open(os.path.join(artifact_dir, VOC_MODULE_FILE), "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        self._call = jax.jit(self._exported.call)

    def vocode(self, mel: np.ndarray, seed: int = 0) -> np.ndarray:
        """mel [T, M] (T <= exported frames; zero-padded up) -> wav
        trimmed back to T*hop samples."""
        from nspeech_tpu.serving.errors import ClientError

        mel = np.asarray(mel, np.float32)
        frames = self.meta["frames"]
        if mel.shape[0] == 0:
            raise ClientError("mel is empty (0 frames)")
        if mel.shape[0] > frames:
            raise ClientError(
                "mel has %d frames; this artifact was exported for "
                "frames=%d" % (mel.shape[0], frames))
        if mel.shape[1] != self.meta["num_mels"]:
            raise ClientError("mel has %d channels; expected %d"
                              % (mel.shape[1], self.meta["num_mels"]))
        n, t_real = self.meta["batch"], mel.shape[0]
        mels = np.zeros((n, frames, mel.shape[1]), np.float32)
        mels[0, :t_real] = mel
        # edge-hold the pad: the live vocoder's upsample clips its frame
        # index at t_real-1 (holds the last frame), while the exported
        # program's clip bound is the static `frames` — replicating the
        # last real frame makes the final hop's interpolation identical
        mels[0, t_real:] = mel[t_real - 1]
        wavs = self._call(jnp.asarray(mels), jax.random.PRNGKey(seed))
        return np.asarray(wavs[0][: t_real * self.meta["hop"]], np.float32)


class ExportedSynthesizer:
    """Serve text -> waveform from an export_synthesizer() artifact.

    Needs no model code, no checkpoint, no training config: the compiled
    program (weights included) is deserialized and called directly; only
    text encoding and wav post-processing run on host.
    """

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, META_FILE)) as f:
            self.meta = json.load(f)
        with open(os.path.join(artifact_dir, MODULE_FILE), "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        self._call = jax.jit(self._exported.call)
        self._cleaners = [c.strip() for c in self.meta["cleaners"].split(",")]

    def synthesize(self, text: str, speaker_id: int = -1
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (waveform float32, mel [T,M], linear [T,F])."""
        wavs, mels, lins = self.synthesize_batch([text], [speaker_id])
        return wavs[0], mels[0], lins[0]

    def synthesize_batch(self, texts, speaker_ids=None):
        """Batch synthesis through the exported program, ``batch`` texts
        per call (the artifact's static batch; larger requests run in
        groups). Returns (list of wavs, mels [N,T,M], lins [N,T,F])."""
        from nspeech_tpu.serving.errors import ClientError
        from nspeech_tpu.text import text_to_sequence
        from nspeech_tpu.text.symbols import PAD_ID

        if speaker_ids is None:
            speaker_ids = [-1] * len(texts)
        n, t = self.meta["batch"], self.meta["text_len"]
        seqs = [text_to_sequence(x, self._cleaners) for x in texts]
        for x, seq in zip(texts, seqs):
            if len(seq) > t:
                raise ClientError(
                    "text %r encodes to %d ids; this artifact was "
                    "exported for text_len=%d" % (x[:40], len(seq), t))
        out_wavs, out_mels, out_lins = [], [], []
        for g in range(0, len(seqs), n):
            group = seqs[g: g + n]
            ids = np.full((n, t), PAD_ID, np.int32)
            lengths = np.zeros((n,), np.int32)
            spk = np.zeros((n,), np.int32)
            for i, seq in enumerate(group):
                ids[i, : len(seq)] = seq
                lengths[i] = len(seq)
                spk[i] = max(speaker_ids[g + i], 0)
            wavs, mels, lins, _aligns, _steps = self._call(
                jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(spk),
                jax.random.PRNGKey(0))
            for i in range(len(group)):
                out_wavs.append(
                    self._postprocess(np.asarray(wavs[i], np.float32)))
                out_mels.append(np.asarray(mels[i]))
                out_lins.append(np.asarray(lins[i]))
        return out_wavs, np.stack(out_mels), np.stack(out_lins)

    def _postprocess(self, wav: np.ndarray) -> np.ndarray:
        # numpy twins of dsp.inv_preemphasis (y[n] = x[n] + k*y[n-1]) and
        # dsp.find_endpoint (audio.py:518-527), so the loader carries no
        # jax-DSP / training-config dependency
        k = self.meta["preemphasis"]
        if k and not self.meta.get("preemphasis_in_program", False):
            # pre-fusion artifacts exported raw GL output
            from scipy.signal import lfilter

            wav = lfilter([1.0], [1.0, -k], wav).astype(np.float32)
        window = int(self.meta["sample_rate"] * self.meta["min_silence_sec"])
        hop = window // 4
        threshold = 10.0 ** (self.meta["silence_threshold_db"] * 0.05)
        for x in range(hop, len(wav) - window, hop):
            if np.max(wav[x: x + window]) < threshold:
                return wav[: x + hop]
        return wav
