"""Streaming text -> waveform synthesis (time-to-first-audio serving).

The one-shot serving path (serving/synthesizer.py + pipeline.py) decodes
the whole utterance, runs the postnet over the whole buffer, then vocodes
the whole mel — first audio arrives after TOTAL utterance latency. This
module streams instead: fixed-size jitted chunk programs chained by
explicit carries, each stage lagging the previous only by its exactness
requirement, so the first waveform chunk leaves the device after a few
decoder chunks rather than after the full decode.

Exactness, stage by stage (all tested in tests/test_streaming.py):

- decoder: ``start_autoregressive`` + ``scan_autoregressive_chunk``
  reproduce the one-shot while_loop buffers bit-exactly;
- postnet: convs have a finite receptive field (layers * (width//2)
  frames per side), so running each window with that halo and cropping
  it off equals the full-sequence conv — zero fill outside the decoded
  region matches both the one-shot buffer's zero tail and SAME padding;
- vocoder: WaveNet is causal; ``generate_chunk`` carries its ring
  buffers, and the local-conditioning window is upsampled with ABSOLUTE
  sample positions so the interpolation arithmetic is the same floats
  the one-shot ``upsample_on_device`` produces (one ulp of difference
  would flip a sampled code and diverge the chain).

Griffin-Lim is deliberately NOT streamed: its iteration is global over
the utterance. Streaming requires the (causal) WaveNet vocoder — the
production configuration.

No reference counterpart: the reference synthesizes whole utterances
only (neural_speech/synthesizer.py; demo_server.py waits for the full
wav). This is TPU-native serving design: static-shape chunk programs,
device-resident carries, one dispatch per chunk.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import stft_params
from nspeech_tpu.models import decoder as D
from nspeech_tpu.text import text_to_sequence
from nspeech_tpu.text.symbols import PAD_ID


def _upsample_abs(window: jnp.ndarray, a: jnp.ndarray, hop: int,
                  length: int, total_frames: jnp.ndarray) -> jnp.ndarray:
    """Upsample mel ``window`` [N, K+1, M] (frames a .. a+K) to samples
    [a*hop, a*hop+length) using the SAME float arithmetic as
    ``upsample_on_device`` over the full utterance: positions are
    ABSOLUTE sample indices divided by hop, and the frame clip uses the
    utterance total — so chunked lc equals sliced one-shot lc bit for
    bit (ops/upsample.py:23-32)."""
    pos = (a * hop + jnp.arange(length)) / hop
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, total_frames - 1)
    i1 = jnp.clip(i0 + 1, 0, total_frames - 1)
    w = (pos - i0.astype(jnp.float32))[None, :, None]
    lo = jnp.take(window, i0 - a, axis=1)
    hi = jnp.take(window, i1 - a, axis=1)
    return lo * (1.0 - w) + hi * w


class StreamingTTS:
    """Chunked text -> wav through the WaveNet vocoder.

    ``chunk_frames`` mel frames are emitted per waveform chunk (must be
    a multiple of ``outputs_per_step``). The stream lags the decoder
    head by ``chunk_frames + postnet_halo + 1`` frames — the exactness
    window — and yields ``chunk_frames * hop`` samples per chunk (the
    final chunk trimmed to the utterance end).
    """

    def __init__(self, synth, vocoder, chunk_frames: int = 40,
                 temperature: float = 1.0, text_bucket: int = 32):
        if vocoder is None or vocoder.net is None:
            raise ValueError("StreamingTTS requires a loaded WaveNet "
                             "vocoder (Griffin-Lim cannot be streamed)")
        if vocoder.net.lc_channels <= 0:
            raise ValueError("vocoder has no local conditioning "
                             "(lc_channels=0); it cannot follow mels")
        cfg = synth.cfg
        self.cfg = cfg
        self.model = synth.model
        self._params = synth._params
        self._bn = synth._bn_state
        self.net = vocoder.net
        self._vparams = vocoder._params
        self._hop = stft_params(cfg)[1]
        self._cleaners = [c.strip() for c in cfg.cleaners.split(",")]
        self._bucket = text_bucket
        r = cfg.outputs_per_step
        if chunk_frames % r:
            chunk_frames += r - chunk_frames % r
        self.k = chunk_frames
        self._k_steps = chunk_frames // r
        self._temperature = float(temperature)
        self._stop = float(cfg.get("stop_threshold", 0.0))
        # postnet receptive-field halo (taco2); taco1 has no postnet on
        # the mel path (decoder frames ARE the mel)
        if hasattr(self.model, "postnet_residual"):
            self._halo = (cfg.postnet_conv_layers
                          * (cfg.postnet_conv_width // 2))
        else:
            self._halo = 0
        # the one-shot postnet input is exactly the [max_iters*r]-frame
        # decode buffer: windows are carved from WITHIN it (its 0 / B
        # edges are the TRUE boundaries where conv SAME padding applies
        # per layer; synthesizing zero fill outside it would feed the
        # first conv data where the one-shot applies padding, which
        # bias/BN turn nonzero — not exact). Windows need k + 2*halo
        # frames; tiny budgets fall back to one whole-buffer window.
        self._buf_frames = cfg.max_iters * r
        if self.k > self._buf_frames:       # chunk can't exceed the budget
            self.k = self._buf_frames
            self._k_steps = self.k // r
        self._whole_postnet = self._buf_frames < self.k + 2 * self._halo
        self._jit_programs()

    # -- jitted chunk programs (compiled once per text bucket) ---------------

    def _jit_programs(self):
        model, params, bn = self.model, self._params, self._bn
        cfg, k_steps = self.cfg, self._k_steps
        num_mels, r = cfg.num_mels, cfg.outputs_per_step
        k, halo, hop = self.k, self._halo, self._hop

        @jax.jit
        def start(ids, lengths, spk):
            ctx, cell0 = model.attention_context(params, bn, ids, lengths,
                                                 spk)
            step = model.make_eval_step(params, ctx)
            (out0, _align0), carry = D.start_autoregressive(
                step, cell0, ids.shape[0], num_mels, cfg.max_iters,
                stop_threshold=self._stop)
            return ctx, out0, carry

        @jax.jit
        def dec_chunk(ctx, carry):
            step = model.make_eval_step(params, ctx)
            (outs, _aligns), carry = D.scan_autoregressive_chunk(
                step, carry, k_steps, num_mels,
                stop_threshold=self._stop)
            return outs, carry

        @jax.jit
        def mel_chunk(window, crop):
            # window: [1, k + 2*halo, M] carved from inside the decode
            # buffer (or [1, B, M] in whole-buffer fallback); ``crop`` is
            # the (traced) offset of the k emitted frames inside it
            if hasattr(model, "postnet_residual"):
                res = model.postnet_residual(params, bn, window)
                mel = window + res
            else:
                mel = window
            return jax.lax.dynamic_slice_in_dim(mel, crop, k, axis=1)

        @jax.jit
        def voc_chunk(carry, mel_window, a, total_frames, gc_ids):
            lc = _upsample_abs(mel_window, a, hop, k * hop, total_frames)
            codes, carry = self.net.generate_chunk(
                self._vparams, carry, k * hop, jax.random.PRNGKey(0),
                gc_ids=gc_ids, lc=lc, temperature=self._temperature)
            from nspeech_tpu.dsp import mu_law_decode

            return mu_law_decode(codes, self.net.quantization_channels), carry

        self._start, self._dec_chunk = start, dec_chunk
        self._mel_chunk, self._voc_chunk = mel_chunk, voc_chunk

    # -- host pipeline --------------------------------------------------------

    def stream(self, text: str, speaker_id: int = -1
               ) -> Iterator[np.ndarray]:
        """Yield waveform chunks (float32, ``chunk_frames * hop`` samples
        each; final chunk trimmed to the utterance's stop frame)."""
        from nspeech_tpu.data.feeder import round_up

        cfg, r, k, halo = self.cfg, self.cfg.outputs_per_step, self.k, \
            self._halo
        seq = text_to_sequence(text, self._cleaners)
        padded = round_up(max(len(seq), 1), self._bucket)
        ids = np.full((1, padded), PAD_ID, np.int32)
        ids[0, : len(seq)] = seq
        lengths = jnp.asarray([len(seq)], jnp.int32)
        spk = jnp.asarray([max(speaker_id, 0)], jnp.int32)

        gc = (jnp.asarray([speaker_id], jnp.int32)
              if speaker_id >= 0 and self.net.gc_channels else None)

        ctx, out0, carry = self._start(jnp.asarray(ids), lengths, spk)
        B = self._buf_frames           # the one-shot postnet input size
        dec = np.zeros((B, cfg.num_mels), np.float32)   # decode buffer
        dec[:r] = np.asarray(D.assemble_outputs(out0[None], cfg.num_mels))[0]
        head = r                       # decoded frames so far
        steps_done = 1

        mel = np.zeros((B, cfg.num_mels), np.float32)   # postnet'ed frames
        mel_head = 0
        voc_carry = self.net.generate_carry0(batch=1)
        a = 0                          # next frame to vocode
        total: Optional[int] = None    # utterance frames, once known

        def mel_ready(upto):
            """Extend the postnet'ed mel to cover frames [0, upto).
            Windows are carved from WITHIN the [0, B) decode buffer so
            their 0/B edges coincide with the true sequence boundaries
            (per-layer conv SAME padding then matches the one-shot
            postnet exactly); interior edges keep a full ``halo`` crop."""
            nonlocal mel_head
            while mel_head < upto:
                b = mel_head
                if self._whole_postnet:
                    w0, win = 0, dec
                else:
                    w0 = min(max(b - halo, 0), B - (k + 2 * halo))
                    win = dec[w0: w0 + k + 2 * halo]
                out = self._mel_chunk(jnp.asarray(win[None]),
                                      jnp.asarray(b - w0, jnp.int32))
                n = min(k, B - b)
                mel[b: b + n] = np.asarray(out)[0, :n]
                mel_head = b + n

        def vocode_next(final_total):
            """Vocode frames [a, a+k); returns the wav chunk."""
            nonlocal a, voc_carry
            mel_ready(min(a + k + 1, final_total or a + k + 1, B))
            win = np.zeros((k + 1, cfg.num_mels), np.float32)
            avail = min(a + k + 1, mel_head) - a
            win[:avail] = mel[a: a + avail]
            if avail < k + 1 and avail > 0:   # edge-hold replication
                win[avail:] = win[avail - 1]
            clip_total = final_total if final_total is not None \
                else a + k + 1
            wav, voc_carry = self._voc_chunk(
                voc_carry, jnp.asarray(win[None]),
                jnp.asarray(a, jnp.int32),
                jnp.asarray(clip_total, jnp.int32), gc)
            a += k
            return np.asarray(wav)[0]

        budget = cfg.max_iters
        while True:
            finished = bool(np.asarray(carry[3]).all())
            if finished or steps_done >= budget:
                break
            # emit every chunk whose exactness window is decoded
            while head >= a + 2 * k + halo:
                yield vocode_next(None)
            outs, carry = self._dec_chunk(ctx, carry)
            got = np.asarray(D.assemble_outputs(outs, cfg.num_mels))[0]
            n = min(got.shape[0], B - head)  # budget overshoot frames do
            if n > 0:                        # not exist in the one-shot
                dec[head: head + n] = got[:n]  # buffer — drop them
            head = min(head + got.shape[0], B)
            steps_done += self._k_steps

        total = int(min(np.asarray(carry[4])[0], budget)) * r
        while a < total:
            chunk = vocode_next(total)
            yield chunk[: (total - a + k) * self._hop]  # a already advanced
        # inspection hook (tests assert it equals the one-shot postnet
        # output over the voiced frames)
        self.last_mel = mel[:total].copy()
        self.last_total_frames = total

    def synthesize(self, text: str, speaker_id: int = -1) -> np.ndarray:
        """Concatenate the stream (convenience / testing)."""
        chunks = list(self.stream(text, speaker_id))
        return (np.concatenate(chunks)
                if chunks else np.zeros((0,), np.float32))
