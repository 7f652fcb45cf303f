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
        "sample_rate": int(cfg.sample_rate),
        # endpoint trim constants (dsp.find_endpoint's inputs)
        "min_silence_sec": 0.8,
        "silence_threshold_db": -40.0,
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


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
        from nspeech_tpu.text import text_to_sequence
        from nspeech_tpu.text.symbols import PAD_ID

        from nspeech_tpu.serving.errors import ClientError

        seq = text_to_sequence(text, self._cleaners)
        n, t = self.meta["batch"], self.meta["text_len"]
        if len(seq) > t:
            raise ClientError(
                "text encodes to %d ids; this artifact was exported for "
                "text_len=%d" % (len(seq), t))
        ids = np.full((n, t), PAD_ID, np.int32)
        ids[0, : len(seq)] = seq
        lengths = np.zeros((n,), np.int32)
        lengths[0] = len(seq)
        spk = np.zeros((n,), np.int32)
        spk[0] = max(speaker_id, 0)
        wavs, mels, lins, _aligns, _steps = self._call(
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(spk),
            jax.random.PRNGKey(0))
        wav = self._postprocess(np.asarray(wavs[0], np.float32))
        return wav, np.asarray(mels[0]), np.asarray(lins[0])

    def _postprocess(self, wav: np.ndarray) -> np.ndarray:
        # numpy twins of dsp.inv_preemphasis (y[n] = x[n] + k*y[n-1]) and
        # dsp.find_endpoint (audio.py:518-527), so the loader carries no
        # jax-DSP / training-config dependency
        k = self.meta["preemphasis"]
        if k:
            from scipy.signal import lfilter

            wav = lfilter([1.0], [1.0, -k], wav).astype(np.float32)
        window = int(self.meta["sample_rate"] * self.meta["min_silence_sec"])
        hop = window // 4
        threshold = 10.0 ** (self.meta["silence_threshold_db"] * 0.05)
        for x in range(hop, len(wav) - window, hop):
            if np.max(wav[x: x + window]) < threshold:
                return wav[: x + hop]
        return wav
