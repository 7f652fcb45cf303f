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

On TPU the vocoder stage runs the Pallas generation kernel with carried
state (ops/pallas/wavenet_gen.py generate_chunk) in 128-aligned
launches on a SAMPLE cursor, fusing lc-upsample -> kernel -> mu-law
into one program per launch and pipelining chunk i's host pull under
launch i+1. Exactness there is at the mu-law CODE level (bit-identical
to the one-shot vocode over a full trained utterance, verified on
chip); the final float mu-law expansion can differ by 1 ulp because it
compiles in a different jit context than the one-shot path's.

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


def _upsample_abs(window: jnp.ndarray, f0: jnp.ndarray, s0: jnp.ndarray,
                  hop: int, length: int,
                  total_frames: jnp.ndarray) -> jnp.ndarray:
    """Upsample mel ``window`` [N, W, M] (frames f0 .. f0+W-1) to samples
    [s0, s0+length) using the SAME float arithmetic as
    ``upsample_on_device`` over the full utterance: positions are
    ABSOLUTE sample indices divided by hop, and the frame clip uses the
    utterance total — so chunked lc equals sliced one-shot lc bit for
    bit (ops/upsample.py:23-32). ``s0`` need not be frame-aligned."""
    pos = (s0 + jnp.arange(length)) / hop
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, total_frames - 1)
    i1 = jnp.clip(i0 + 1, 0, total_frames - 1)
    w = (pos - i0.astype(jnp.float32))[None, :, None]
    lo = jnp.take(window, i0 - f0, axis=1)
    hi = jnp.take(window, i1 - f0, axis=1)
    return lo * (1.0 - w) + hi * w


class StreamingTTS:
    """Chunked text -> wav through the WaveNet vocoder.

    ``chunk_frames`` mel frames are emitted per waveform chunk (must be
    a multiple of ``outputs_per_step``). The stream lags the decoder
    head by ``chunk_frames + postnet_halo + 1`` frames — the exactness
    window. The FIRST chunk carries ``chunk_frames * hop`` samples
    (time-to-first-audio); later chunks double in length up to
    ``growth`` times that (``growth=1`` keeps them fixed), amortizing
    the fixed per-launch dispatch cost over more audio — the output is
    IDENTICAL for any schedule (the vocoder is causal with absolute
    sample positions; only the yield boundaries move). The final chunk
    is trimmed to the utterance end.
    """

    def __init__(self, synth, vocoder, chunk_frames: int = 40,
                 temperature: float = 1.0, text_bucket: int = 32,
                 use_pallas: Optional[bool] = None, growth: int = 4):
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
        # Vocoder backend: the Pallas streaming kernel sustains ~5x real
        # time on the chip where the lax.scan generator is ~0.7x; it
        # advances in 128-sample launches, so the vocoder runs on its own
        # SAMPLE cursor decoupled from the mel-frame cursor (the final
        # launch overshoots into edge-held lc and the overshoot is
        # discarded — causality makes it invisible to the kept samples).
        if use_pallas is None:
            use_pallas = (jax.default_backend() not in ("cpu",)
                          and not self.net.scalar_input
                          and self.net.filter_width == 2)
        self._use_pallas = use_pallas
        self._pallas_gens: dict = {}   # gc key -> PallasWaveNetGenerator
        self._pallas_vocs: dict = {}   # generator -> fused launch program
        if use_pallas:
            from nspeech_tpu.ops.pallas.wavenet_gen import LANE

            self._V = max(LANE, self.k * self._hop // LANE * LANE)
        else:
            self._V = self.k * self._hop
        # Launch-size schedule: the FIRST vocoder launch stays at V (it
        # gates time-to-first-audio), then launches double up to
        # growth*V. Every launch pays a fixed cost that is independent
        # of its length (relay/dispatch round trip, host pull, Python)
        # — on the measured chip ~80 ms against ~100 ms of kernel time
        # for a 0.5 s launch — so doubling amortizes that cost over 2x/
        # 4x more audio and lifts the SUSTAINED rate toward the
        # kernel's serial capacity, while the client's buffer (filled
        # faster than real time from chunk 1) rides out the longer
        # inter-chunk gaps. growth=1 restores fixed-size launches.
        self._growth = max(1, int(growth))
        self._Vs = [self._V]
        while self._Vs[-1] < self._V * self._growth:
            self._Vs.append(min(self._Vs[-1] * 2, self._V * self._growth))
        self._W = self._V // self._hop + 3   # FIRST launch's lc window
        self._jit_programs()

    def _W_of(self, V: int) -> int:
        """Static lc window frames for a V-sample launch: every sample
        in [s0, s0+V) interpolates rows floor(pos/hop) and +1, and s0
        need not be frame-aligned — V//hop + 3 covers the worst case."""
        return V // self._hop + 3

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
                stop_threshold=self._stop,
                initial_finished=lengths < 1)   # batch-padding rows
            return ctx, out0, carry

        def make_dec(m):
            @jax.jit
            def dec_chunk(ctx, carry):
                step = model.make_eval_step(params, ctx)
                (outs, _aligns), carry = D.scan_autoregressive_chunk(
                    step, carry, m * k_steps, num_mels,
                    stop_threshold=self._stop)
                return outs, carry
            return dec_chunk

        # First-window prefix: encoder + the decoder steps and postnet
        # rows the FIRST wav chunk needs, in ONE program. Dispatch
        # latency dominates time-to-first-audio on remote-dispatch
        # serving (each round trip ~20 ms through this testbed's relay;
        # the prefix replaces ~6 of them with one). Exactness: same
        # decode primitives, and the postnet window starts at the TRUE
        # 0-boundary with an interior halo crop on the right — the same
        # window property mel_ready relies on.
        W, halo_ = self._W, self._halo
        n0 = -(-(W + halo_) // r)              # ceil: frames the window needs
        self._prefix_frames = n0 * r
        self._use_prefix = (not self._whole_postnet
                            and n0 <= cfg.max_iters
                            and self._buf_frames >= W + halo_)

        @jax.jit
        def prefix(ids, lengths, spk):
            ctx, cell0 = model.attention_context(params, bn, ids, lengths,
                                                 spk)
            step = model.make_eval_step(params, ctx)
            (out0, _a0), carry = D.start_autoregressive(
                step, cell0, ids.shape[0], num_mels, cfg.max_iters,
                stop_threshold=self._stop,
                initial_finished=lengths < 1)   # batch-padding rows
            (outs, _as), carry = D.scan_autoregressive_chunk(
                step, carry, n0 - 1, num_mels, stop_threshold=self._stop)
            dec0 = jnp.concatenate(
                [D.assemble_outputs(out0[None], num_mels),
                 D.assemble_outputs(outs, num_mels)], axis=1)  # [N, n0*r, M]
            win = dec0[:, : W + halo_]
            if hasattr(model, "postnet_residual"):
                mel0 = win + model.postnet_residual(params, bn, win)
            else:
                mel0 = win
            return ctx, carry, dec0, mel0[:, :W]

        def make_mel(m):
            @jax.jit
            def mel_chunk(window, crop):
                # window: [N, m*k + 2*halo, M] carved from inside the
                # decode buffer (or [N, B, M] in whole-buffer fallback);
                # ``crop`` is the (traced) offset of the m*k emitted
                # frames inside it
                if hasattr(model, "postnet_residual"):
                    res = model.postnet_residual(params, bn, window)
                    mel = window + res
                else:
                    mel = window
                return jax.lax.dynamic_slice_in_dim(mel, crop, m * k,
                                                    axis=1)
            return mel_chunk

        from nspeech_tpu.dsp import mu_law_decode

        def make_voc(V):
            @jax.jit
            def voc_chunk(carry, mel_window, f0, s0, total_frames, gc_ids):
                lc = _upsample_abs(mel_window, f0, s0, hop, V, total_frames)
                codes, carry = self.net.generate_chunk(
                    self._vparams, carry, V, jax.random.PRNGKey(0),
                    gc_ids=gc_ids, lc=lc, temperature=self._temperature)
                return (mu_law_decode(codes, self.net.quantization_channels),
                        carry)
            return voc_chunk

        # One program per ramp size for every chained stage (jit is
        # lazy — only sizes a stream actually reaches compile). The
        # decoder/postnet multipliers mirror the vocoder launch ramp:
        # per-iteration fixed costs (dispatch round trip + the postnet
        # output pull) dominate the steady state on a remote-dispatch
        # chip, so once first audio is out the pipeline advances in
        # growth-times-larger chunks at every stage.
        self._Ms = [max(1, Vn // self._V) for Vn in self._Vs]
        self._voc_chunks = {Vn: make_voc(Vn) for Vn in self._Vs}
        self._dec_chunks = {m: make_dec(m) for m in self._Ms}
        self._mel_chunks = {m: make_mel(m) for m in self._Ms}

        self._start = start
        self._prefix = prefix

    def _pallas_gen(self, gc_key, batch: int):
        """Pallas streaming generator, params packed per gc-ids key
        (``gc_key``: None for unconditioned, else a tuple of per-stream
        speaker ids)."""
        if (gc_key, batch) not in self._pallas_gens:
            from nspeech_tpu.ops.pallas.wavenet_gen import (
                PallasWaveNetGenerator)

            gc = (jnp.asarray(gc_key, jnp.int32)
                  if gc_key is not None else None)
            # Each generator pins a packed copy of the weights on device
            # and gc_key is the per-stream speaker TUPLE — a multi-speaker
            # streaming server could otherwise accumulate one copy per
            # distinct request-window composition. Bound the cache (LRU).
            while len(self._pallas_gens) >= 8:
                old_key, old_gen = next(iter(self._pallas_gens.items()))
                self._pallas_gens.pop(old_key)
                self._pallas_vocs = {k: v for k, v in
                                     self._pallas_vocs.items()
                                     if k[0] != id(old_gen)}
            self._pallas_gens[(gc_key, batch)] = PallasWaveNetGenerator(
                self.net, self._vparams, gc_ids=gc)
        else:  # LRU refresh
            self._pallas_gens[(gc_key, batch)] = self._pallas_gens.pop(
                (gc_key, batch))
        return self._pallas_gens[(gc_key, batch)]

    def _pallas_voc(self, gc_key, batch: int, V: Optional[int] = None):
        """ONE jitted program per (launch size, gc key): lc upsample ->
        streaming kernel -> mu-law decode. Composing through
        generate_chunk instead would eagerly dispatch the lc layout
        transforms and the decode per launch — several extra device
        round trips that dominate on a remote-relay chip."""
        gen = self._pallas_gen(gc_key, batch)
        if V is None:
            V = self._V
        key = (id(gen), V)
        if key not in self._pallas_vocs:
            from nspeech_tpu.dsp import mu_law_decode
            from nspeech_tpu.ops.pallas.wavenet_gen import LANE

            hop, M = self._hop, self.net.lc_channels
            n_chunks = V // LANE
            deterministic = self._temperature <= 0.0
            fn = gen._get_fn(batch, n_chunks, 0, self._temperature,
                             deterministic, True, carry_io=True)
            wargs = gen._weight_args(batch, True)
            forced = jnp.zeros((n_chunks, batch, LANE), jnp.int32)
            Q = self.net.quantization_channels

            @jax.jit
            def voc(rings, oh, cc, window, f0, s0, t0, total, seed):
                lc = _upsample_abs(window, f0, s0, hop, V, total)
                lc_mel = jnp.transpose(lc, (1, 0, 2)).reshape(
                    n_chunks, LANE, batch, M)
                codes, rings, oh, cc = fn(seed, t0, forced, lc_mel,
                                          *wargs, rings, oh, cc)
                codes = jnp.transpose(codes, (1, 0, 2)).reshape(batch, V)
                return mu_law_decode(codes, Q), rings, oh, cc

            self._pallas_vocs[key] = voc
        return self._pallas_vocs[key]

    # -- host pipeline --------------------------------------------------------

    def stream(self, text: str, speaker_id: int = -1
               ) -> Iterator[np.ndarray]:
        """Yield waveform chunks (float32; the final chunk trimmed to the
        utterance's stop frame). Single-stream form of
        :meth:`stream_batch`."""
        for chunks in self.stream_batch([text], [speaker_id]):
            if chunks[0] is not None and len(chunks[0]):
                yield chunks[0]

    def stream_batch(self, texts, speaker_ids=None):
        """Stream N utterances CONCURRENTLY through one batched pipeline.

        Yields lists aligned with ``texts``: element i is stream i's next
        waveform chunk (float32), or None when stream i has no samples
        this round (it already ended — streams stop at their own stop
        frame while the batch keeps going for the longest one). The
        decoder, postnet, and vocoder all advance in lockstep as single
        batched programs — on TPU the vocoder is ONE carried-state Pallas
        launch per chunk for all N streams (batch rides the sublane
        dimension, so N streams cost barely more wall-clock per step than
        one; see ops/pallas/wavenet_gen.py).

        Per-stream trimming follows the decoder's stop frames; the shared
        lc frame clip is the batch maximum, matching the one-shot
        ``synthesize_batch``/``vocode_batch`` padding semantics
        (pipeline.py:170-206).
        """
        from nspeech_tpu.data.feeder import round_up

        cfg, r, k, halo = self.cfg, self.cfg.outputs_per_step, self.k, \
            self._halo
        N = len(texts)
        if speaker_ids is None:
            speaker_ids = [-1] * N
        n_real = N
        # Pad the batch axis to a power of two (synthesize_batch's rule):
        # every distinct N would otherwise compile its own decoder /
        # postnet / Pallas-kernel variants. Padding rows get length 0 —
        # the decoder marks them finished at t=0, so they never extend
        # the batch's decode — and their chunks are dropped at delivery.
        N = max(1, 1 << (N - 1).bit_length())
        seqs = [text_to_sequence(t, self._cleaners) for t in texts]
        padded = round_up(max(max(len(sq) for sq in seqs), 1), self._bucket)
        ids = np.full((N, padded), PAD_ID, np.int32)
        for i, sq in enumerate(seqs):
            ids[i, : len(sq)] = sq
        lengths = np.zeros((N,), np.int32)
        lengths[:n_real] = [len(sq) for sq in seqs]
        lengths = jnp.asarray(lengths)
        spk_np = np.zeros((N,), np.int32)
        spk_np[:n_real] = [0 if (s is None or s < 0) else s
                           for s in speaker_ids]
        spk = jnp.asarray(spk_np)

        gc = None
        gc_key = None
        if self.net.gc_channels:
            missing = [s is None or s < 0 for s in speaker_ids]
            if any(missing) and not all(missing):
                from nspeech_tpu.serving.errors import ClientError

                raise ClientError(
                    "stream_batch: cannot mix explicit speaker_ids and "
                    "-1/None (unconditioned) in one vocoder batch")
            if not any(missing):
                gc_key = tuple(int(s) for s in spk_np)
                gc = jnp.asarray(gc_key, jnp.int32)

        B = self._buf_frames           # the one-shot postnet input size
        dec = np.zeros((N, B, cfg.num_mels), np.float32)  # decode buffer
        mel = np.zeros((N, B, cfg.num_mels), np.float32)  # postnet'ed
        if self._use_prefix:
            # one dispatch covers encoder + first decoder steps + first
            # postnet rows (see _jit_programs.prefix)
            ctx, carry, dec0, mel0 = self._prefix(jnp.asarray(ids),
                                                  lengths, spk)
            head = min(self._prefix_frames, B)
            dec[:, :head] = np.asarray(dec0)[:, :head]
            mel_head = self._W
            mel[:, :mel_head] = np.asarray(mel0)
            steps_done = self._prefix_frames // r
        else:
            ctx, out0, carry = self._start(jnp.asarray(ids), lengths, spk)
            dec[:, :r] = np.asarray(D.assemble_outputs(out0[None],
                                                       cfg.num_mels))
            head = r                   # decoded frames so far (lockstep)
            steps_done = 1
            mel_head = 0
        use_pallas = self._use_pallas
        if use_pallas:
            pvocs = {Vn: self._pallas_voc(gc_key, N, Vn)
                     for Vn in self._Vs}
            voc_carry = self._pallas_gen(gc_key, N).chunk_carry0(N)
        else:
            voc_carry = self.net.generate_carry0(batch=N)
        hop = self._hop
        launches = 0                   # ramp position (see __init__)

        def next_V() -> int:
            """Sample length of the NEXT vocoder launch: V for the
            first (time-to-first-audio), then doubling to growth*V."""
            return self._Vs[min(launches, len(self._Vs) - 1)]

        s = 0                          # next SAMPLE to vocode (lockstep)
        budget = cfg.max_iters
        # per-stream frame totals, known once that row's stop frame fires
        row_done = np.zeros((N,), bool)
        row_total = np.full((N,), B, np.int64)
        total_max: Optional[int] = None   # batch frame total, once known

        def pull_stops():
            nonlocal row_done, row_total
            row_done = np.asarray(carry[3]).astype(bool)
            if row_done.any():
                # only finished rows' totals are ever read (delivery
                # trims); skipping the second device pull on the common
                # no-rows-finished iteration halves the per-chunk
                # round trips on a remote-relay chip
                stops = np.minimum(np.asarray(carry[4]), budget)
                row_total = np.where(row_done, stops * r, B)

        def mel_m() -> int:
            """Postnet window multiplier: 1 until first audio is out,
            then the largest ramp multiplier whose window fits in B."""
            m = 1 if launches == 0 else self._Ms[-1]
            while m > 1 and (m * k + 2 * halo > B or m not in self._Ms):
                m //= 2
            return m

        def mel_ready(upto):
            """Extend the postnet'ed mel to cover frames [0, upto).
            Windows are carved from WITHIN the [0, B) decode buffer so
            their 0/B edges coincide with the true sequence boundaries
            (per-layer conv SAME padding then matches the one-shot
            postnet exactly); interior edges keep a full ``halo`` crop.
            Window size rides the ramp (postnet windows of ANY size
            with halo crops are exact — only the carve points move)."""
            nonlocal mel_head
            while mel_head < upto:
                b = mel_head
                m = mel_m()
                km = m * k
                if self._whole_postnet:
                    w0, win = 0, dec
                else:
                    w0 = min(max(b - halo, 0), B - (km + 2 * halo))
                    win = dec[:, w0: w0 + km + 2 * halo]
                # dynamic_slice CLAMPS an out-of-range start (crop+km
                # must stay inside the window, or rows silently repeat):
                # cap the crop and index the wanted rows past it on host
                # — matters when mel_head is not km-aligned (prefix path)
                crop = min(b - w0, win.shape[1] - km)
                off = (b - w0) - crop
                out = self._mel_chunks[m](jnp.asarray(win),
                                          jnp.asarray(crop, jnp.int32))
                n = min(km, B - b)
                mel[:, b: b + n] = np.asarray(out)[:, off: off + n]
                mel_head = b + n

        def vocode_next():
            """Vocode samples [s, s+V) for all streams, V from the ramp
            schedule; returns ``(device wav [N, V], launch start s0)``."""
            nonlocal s, voc_carry, launches
            V = next_V()
            W = self._W_of(V)
            launches += 1
            f0 = s // hop
            fe = (s + V) // hop + 2        # highest frame row touched
            mel_ready(min(fe + 1,
                          total_max if total_max is not None else B, B))
            win = np.zeros((N, W, cfg.num_mels), np.float32)
            avail = min(f0 + W, mel_head) - f0
            win[:, :avail] = mel[:, f0: f0 + avail]
            if avail < W and avail > 0:       # edge-hold replication
                win[:, avail:] = win[:, avail - 1: avail]
            # a non-binding clip equals the one-shot's (its total never
            # binds this far from the end); the BATCH total binds the
            # tail — the one-shot batch path also clips every stream at
            # the batch maximum (vocode_batch(mels[:, :t_max]))
            clip_total = total_max if total_max is not None else fe + 2
            if use_pallas:
                t0, rings, oh, cc = voc_carry
                wav, rings, oh, cc = pvocs[V](
                    rings, oh, cc, jnp.asarray(win),
                    jnp.asarray(f0, jnp.int32), jnp.asarray(s, jnp.int32),
                    jnp.asarray([t0], jnp.int32),
                    jnp.asarray(clip_total, jnp.int32),
                    jnp.asarray([s], jnp.int32))
                voc_carry = (t0 + V, rings, oh, cc)
            else:
                wav, voc_carry = self._voc_chunks[V](
                    voc_carry, jnp.asarray(win),
                    jnp.asarray(f0, jnp.int32), jnp.asarray(s, jnp.int32),
                    jnp.asarray(clip_total, jnp.int32), gc)
            s0, s = s, s + V
            return wav, s0   # device array; pulled by deliver()

        # Launch pipelining: chunk i's host pull rides under chunk i+1's
        # device time. The FIRST chunk is pulled immediately (time to
        # first audio); later chunks are held one dispatch and delivered
        # when the next launch is in flight.
        pending = None                 # (device wav, chunk start sample)
        first_sent = False

        def deliver(item):
            dev, s0 = item
            wav = np.asarray(dev)          # [N, V]; padding rows dropped
            out = []
            for i in range(n_real):
                if row_done[i]:
                    end = int(row_total[i]) * hop
                    m = min(wav.shape[1], end - s0)
                    out.append(wav[i, :m] if m > 0 else None)
                else:
                    out.append(wav[i])
            return out

        if self._use_prefix:
            # the prefix already decoded + postnet'ed the first lc
            # window: emit the first wav chunk NOW (one voc dispatch)
            # unless every stream already stopped — then the tail loop
            # below must vocode it with the true (binding) frame clip
            pull_stops()
            if not row_done.all():
                item = vocode_next()
                first_sent = True
                yield deliver(item)

        while True:
            pull_stops()
            if row_done.all() or steps_done >= budget:
                break
            # emit every chunk whose exactness window is decoded: the lc
            # window needs postnet'ed rows through (s+V)//hop + 2, and
            # postnet'ing row b needs decoded rows through b + m*k + halo
            while head >= min((s + next_V()) // hop + 3
                              + mel_m() * k + halo, B):
                item = vocode_next()
                if not first_sent:
                    first_sent = True
                    yield deliver(item)             # first audio: no hold
                else:
                    if pending is not None:
                        yield deliver(pending)
                    pending = item
            # decoder chunk multiplier rides the ramp too: 1 until first
            # audio is out (it gates time-to-first-audio), then max —
            # scan chunking is exact for any step count
            m_dec = 1 if launches == 0 else self._Ms[-1]
            outs, carry = self._dec_chunks[m_dec](ctx, carry)
            got = np.asarray(D.assemble_outputs(outs, cfg.num_mels))
            n = min(got.shape[1], B - head)  # budget overshoot frames do
            if n > 0:                        # not exist in the one-shot
                dec[:, head: head + n] = got[:, :n]  # buffer — drop them
            head = min(head + got.shape[1], B)
            steps_done += m_dec * self._k_steps

        pull_stops()
        row_total = np.minimum(np.asarray(carry[4]), budget) * r
        row_done[:] = True
        total_max = int(row_total.max())
        samples_total = total_max * hop
        while s < samples_total:
            item = vocode_next()
            if not first_sent:
                first_sent = True
                yield deliver(item)
            else:
                if pending is not None:
                    yield deliver(pending)
                pending = item
        if pending is not None:
            yield deliver(pending)
        # inspection hooks (tests assert stream 0's mel equals the
        # one-shot postnet output over the voiced frames)
        self.last_mels = [mel[i, : int(row_total[i])].copy()
                          for i in range(n_real)]
        # untrimmed shared-clip batch (what vocode_batch would receive)
        self.last_mel_batch = mel[:n_real, :total_max].copy()
        self.last_mel = self.last_mels[0]
        self.last_total_frames = int(row_total[0])

    def synthesize(self, text: str, speaker_id: int = -1) -> np.ndarray:
        """Concatenate the stream (convenience / testing)."""
        chunks = list(self.stream(text, speaker_id))
        return (np.concatenate(chunks)
                if chunks else np.zeros((0,), np.float32))

    def synthesize_batch(self, texts, speaker_ids=None):
        """Concatenate each stream of :meth:`stream_batch` (convenience /
        testing). Returns a list of per-stream waveforms."""
        parts = [[] for _ in texts]
        for chunks in self.stream_batch(texts, speaker_ids):
            for i, c in enumerate(chunks):
                if c is not None and len(c):
                    parts[i].append(c)
        return [np.concatenate(p) if p else np.zeros((0,), np.float32)
                for p in parts]
