"""Tacotron-2: conv+BiLSTM encoder, location-sensitive attention, LSTM
decoder, postnet residual, conv+BiLSTM "expand" network to linear spectra.

TPU-native rebuild of the reference model
(reference: neural_speech/models/tacotron2.py). The decoder step — prenet ->
attention LSTM -> location-sensitive attention -> 2x1024 LSTM -> r-frame
projection — is one fused ``lax.scan`` body (SURVEY.md §7.5). Alignment
state (the previous alignment vector) threads through the scan carry; the
full history is emitted as scan outputs, not materialized as a growing
TensorArray.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nspeech_tpu.config import Config
from nspeech_tpu.models import attention as A
from nspeech_tpu.models import decoder as D
from nspeech_tpu.models import modules as M
from nspeech_tpu.ops import deferred as DF
from nspeech_tpu.ops import layers as L
from nspeech_tpu.ops import policy as P
from nspeech_tpu.text.symbols import symbols

softsign = jax.nn.soft_sign


class Tacotron2:
    name = "taco2"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.multi_speaker = cfg.num_speakers > 1
        self._enc_meta = {"lstm_units": cfg.encoder_lstm_units}
        self._expand_meta = {"lstm_units": cfg.expand_lstm_units}
        self._memory_dim = 2 * cfg.encoder_lstm_units  # 512

    def init(self, key) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 16))
        vocab = len(symbols)
        M_dim = cfg.num_mels
        r = cfg.outputs_per_step

        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}

        params["embedding"] = L.init_embedding(next(keys), vocab, cfg.embedding_dim)
        spk_dim = None
        if self.multi_speaker:
            params["speaker_embed"] = {
                "table": L.glorot_uniform(
                    next(keys), (cfg.num_speakers, cfg.speaker_embed_dim),
                    cfg.num_speakers, cfg.speaker_embed_dim)
            }
            spk_dim = cfg.speaker_embed_dim

        params["encoder"], state["encoder"], _ = M.init_conv_and_lstm(
            next(keys), cfg.embedding_dim, cfg.encoder_conv_layers,
            cfg.encoder_conv_width, cfg.encoder_conv_channels,
            cfg.encoder_lstm_units)

        # Reference hardwires attention_type="location_sensitive" here
        # (tacotron2.py:63-64) regardless of the config key.
        params["attention"] = A.init_attention(
            next(keys), "location_sensitive", cfg.attention_dim,
            self._memory_dim, query_dim=cfg.attention_dim)

        params["decoder_prenet"] = L.init_prenet(
            next(keys), M_dim + self._memory_dim, [256, 128])
        attn_in = 128
        if self.multi_speaker:
            params["spk_prenet"] = L.init_dense(next(keys), spk_dim, 128)
            attn_in += 128
        params["attn_lstm"] = L.init_lstm(next(keys), attn_in, cfg.attention_dim)
        dec_in = cfg.attention_dim + self._memory_dim  # concat(output, context)
        params["lstm1"] = L.init_lstm(next(keys), dec_in, cfg.decoder_lstm_units)
        params["lstm2"] = L.init_lstm(
            next(keys), cfg.decoder_lstm_units, cfg.decoder_lstm_units)
        params["frame_proj"] = L.init_dense(
            next(keys), cfg.decoder_lstm_units, M_dim * r)

        params["postnet"], state["postnet"] = M.init_postnet(
            next(keys), M_dim, cfg.postnet_conv_layers, cfg.postnet_conv_width,
            cfg.postnet_conv_channels)

        params["expand"], state["expand"], _ = M.init_conv_and_lstm(
            next(keys), M_dim, cfg.expand_conv_layers, cfg.expand_conv_width,
            cfg.expand_conv_channels, cfg.expand_lstm_units)
        params["linear_proj"] = L.init_dense(
            next(keys), 2 * cfg.expand_lstm_units, cfg.num_freq)
        return params, state

    # -- decoder step -----------------------------------------------------

    def _make_step(self, params, keys_mem, values, mask, spk,
                   is_training: bool, deferred: bool = False):
        cfg = self.cfg
        drop = cfg.drop_rate if is_training else 0.0
        win_fwd = int(cfg.get("attention_win_fwd", 0))
        win_back = int(cfg.get("attention_win_back", 1))
        windowed = (not is_training) and win_fwd > 0

        def step(carry, x, rng_t, zs=None):
            (c1, h1), context, align, (c2, h2), (c3, h3) = carry
            cell_in = jnp.concatenate([x, context], axis=-1)
            pre = L.prenet(params["decoder_prenet"], cell_in, drop, rng_t)
            if spk is not None:
                s = L.dense(params["spk_prenet"], spk, softsign)
                pre = jnp.concatenate([pre, s], axis=-1)
            if deferred:
                out1, (c1, h1), xh1 = DF.lstm_cell_deferred(
                    params["attn_lstm"], pre, (c1, h1), zs["attn_lstm"])
            else:
                out1, (c1, h1) = L.lstm_cell(params["attn_lstm"], pre, (c1, h1))
            m = (A.window_mask(align, mask, win_back, win_fwd)
                 if windowed else mask)
            context, align = A.attention_step(
                params["attention"], "location_sensitive", out1, align,
                keys_mem, values, m)
            concat_out = jnp.concatenate([out1, context], axis=-1)
            if deferred:
                out2, (c2, h2), xh2 = DF.lstm_cell_deferred(
                    params["lstm1"], concat_out, (c2, h2), zs["lstm1"])
                out3, (c3, h3), xh3 = DF.lstm_cell_deferred(
                    params["lstm2"], out2, (c3, h3), zs["lstm2"])
                out, fp_in = DF.dense_deferred(
                    params["frame_proj"], out3, zs["frame_proj"])
                aux = {"attn_lstm": xh1, "lstm1": xh2, "lstm2": xh3,
                       "frame_proj": fp_in}
                return ((c1, h1), context, align, (c2, h2), (c3, h3)), (
                    out, align, aux)
            out2, (c2, h2) = L.lstm_cell(params["lstm1"], concat_out, (c2, h2))
            out3, (c3, h3) = L.lstm_cell(params["lstm2"], out2, (c3, h3))
            out = L.dense(params["frame_proj"], out3)
            return ((c1, h1), context, align, (c2, h2), (c3, h3)), (out, align)

        return step

    def deferred_zero_inputs(self, batch: int, steps: int,
                             t_in: int = None, t_out: int = None):
        """Zero per-step injection tensors for deferred-dW training (see
        ops/deferred.py): one [S, N, out] array per in-scan matmul whose
        weight gradient is accumulated post-hoc. ``t_in``/``t_out``
        additionally defer the encoder/expand BiLSTM recurrent kernels
        (those scans run at text/frame rate, not decoder rate)."""
        cfg = self.cfg
        z = jnp.zeros
        zs = {
            "attn_lstm": z((steps, batch, 4 * cfg.attention_dim)),
            "lstm1": z((steps, batch, 4 * cfg.decoder_lstm_units)),
            "lstm2": z((steps, batch, 4 * cfg.decoder_lstm_units)),
            "frame_proj": z((steps, batch,
                             cfg.num_mels * cfg.outputs_per_step)),
        }
        if t_in is not None:
            zs["encoder_lstm"] = z(
                (t_in, 2 * batch, 4 * cfg.encoder_lstm_units))
        if t_out is not None:
            zs["expand_lstm"] = z(
                (t_out, 2 * batch, 4 * cfg.expand_lstm_units))
        return zs

    def deferred_merge_grads(self, grads, aux, dzs):
        """Fill the stop_gradient'ed weight grads in ``grads`` from the
        stacked scan activations (aux) and injection cotangents (dzs)."""
        for name in ("attn_lstm", "lstm1", "lstm2", "frame_proj"):
            g = DF.matmul_grads(aux[name], dzs[name])
            grads[name] = {k: v for k, v in g.items() if k in grads[name]}
        for comp in ("encoder", "expand"):
            key = comp + "_lstm"
            if key not in dzs:
                continue
            for d, dwh in zip(("lstm_fw", "lstm_bw"),
                              DF.bilstm_wh_grads(aux[key], dzs[key])):
                k = grads[comp][d]["kernel"]
                # last H rows (the recurrent block) are exactly zero under
                # stop_gradient; the input rows/bias got natural grads
                # through the hoisted projection.
                grads[comp][d]["kernel"] = (
                    k.at[-dwh.shape[0]:].set(dwh.astype(k.dtype)))
        return grads

    def _decoder_carry0(self, batch: int, t_in: int, dtype=jnp.float32):
        cfg = self.cfg

        def z(shape):
            return jnp.zeros(shape, dtype)

        def lstm_state(units):
            return (z((batch, units)), z((batch, units)))

        return (
            lstm_state(cfg.attention_dim),
            z((batch, self._memory_dim)),
            A.initial_alignments("location_sensitive", batch, t_in, dtype),
            lstm_state(cfg.decoder_lstm_units),
            lstm_state(cfg.decoder_lstm_units),
        )

    # -- streaming hooks ------------------------------------------------------

    def attention_context(self, params, state, text_inputs, input_lengths,
                          speaker_ids=None):
        """Encoder side only (inference): returns ``(step_ctx, carry0)``
        for chunked decoding via ``make_eval_step`` +
        ``decoder.start_autoregressive`` / ``scan_autoregressive_chunk``
        — the same tensors forward() builds before its decode scan."""
        n, t_in = text_inputs.shape
        dtype = P.compute_dtype(self.cfg)
        params = P.cast_floats(params, dtype)
        embedded = L.embedding(params["embedding"], text_inputs)
        spk = None
        if self.multi_speaker:
            spk = jnp.take(params["speaker_embed"]["table"], speaker_ids,
                           axis=0)
        enc_out, _ = M.conv_and_lstm(
            params["encoder"], state["encoder"], self._enc_meta,
            embedded, input_lengths, False)
        keys_mem = A.prepare_memory(params["attention"], enc_out)
        mask = (jnp.arange(t_in)[None, :]
                < jnp.maximum(input_lengths, 1)[:, None])
        return ((keys_mem, enc_out, mask, spk),
                self._decoder_carry0(n, t_in, dtype))

    def make_eval_step(self, params, step_ctx):
        keys_mem, enc_out, mask, spk = step_ctx
        params = P.cast_floats(params, P.compute_dtype(self.cfg))
        return self._make_step(params, keys_mem, enc_out, mask, spk,
                               is_training=False)

    def postnet_residual(self, params, state, frames):
        """Postnet over a frame window (inference; BN uses running
        stats). mel = decoder frames + this residual."""
        dtype = P.compute_dtype(self.cfg)
        residual, _ = M.postnet(P.cast_floats(params["postnet"], dtype),
                                state["postnet"],
                                P.cast_floats(frames, dtype), False)
        return residual

    # -- forward ------------------------------------------------------------

    def forward(
        self,
        params,
        state,
        text_inputs: jnp.ndarray,
        input_lengths: jnp.ndarray,
        speaker_ids: Optional[jnp.ndarray] = None,
        mel_targets: Optional[jnp.ndarray] = None,
        is_training: bool = False,
        rng: Optional[jnp.ndarray] = None,
        deferred_zs=None,
    ):
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        _, rng_dec = jax.random.split(rng)
        n, t_in = text_inputs.shape

        # Mixed-precision entry (ops/policy.py): f32 masters stay outside;
        # the cast's autodiff transpose returns f32 grads to them.
        dtype = P.compute_dtype(cfg)
        params = P.cast_floats(params, dtype)
        mel_targets = P.cast_floats(mel_targets, dtype)
        deferred_zs = P.cast_floats(deferred_zs, dtype)

        embedded = L.embedding(params["embedding"], text_inputs)
        spk = None
        if self.multi_speaker:
            spk = jnp.take(params["speaker_embed"]["table"], speaker_ids, axis=0)
        enc_z = None if deferred_zs is None else deferred_zs.get("encoder_lstm")
        extra_aux = {}
        if enc_z is not None:
            enc_out, enc_state, extra_aux["encoder_lstm"] = M.conv_and_lstm(
                params["encoder"], state["encoder"], self._enc_meta,
                embedded, input_lengths, is_training, z=enc_z)
        else:
            enc_out, enc_state = M.conv_and_lstm(
                params["encoder"], state["encoder"], self._enc_meta,
                embedded, input_lengths, is_training)

        keys_mem = A.prepare_memory(params["attention"], enc_out)
        # max(len, 1) keeps the softmax finite for length-0 batch-padding
        # rows (they are marked finished at t=0 below and emit zeros).
        mask = jnp.arange(t_in)[None, :] < jnp.maximum(input_lengths, 1)[:, None]
        step = self._make_step(params, keys_mem, enc_out, mask, spk,
                               is_training, deferred=deferred_zs is not None)
        carry0 = self._decoder_carry0(n, t_in, dtype)

        lengths = None
        deferred_aux = None
        if mel_targets is not None:
            inputs = D.teacher_frames(mel_targets, cfg.outputs_per_step)
            ss = (float(cfg.get("scheduled_sampling_ratio", 0.0))
                  if is_training else 0.0)
            if deferred_zs is not None:
                # only decoder-rate injections ride the decoder scan; the
                # encoder/expand BiLSTM entries run at text/frame rate
                dec_zs = {k: v for k, v in deferred_zs.items()
                          if k not in ("encoder_lstm", "expand_lstm")}
                outs, aligns, deferred_aux = D.scan_teacher_deferred(
                    step, carry0, inputs, dec_zs, rng_dec,
                    sampling_ratio=ss)
            else:
                outs, aligns = D.scan_teacher(step, carry0, inputs, rng_dec,
                                              sampling_ratio=ss)
        else:
            outs, aligns, lengths = D.scan_autoregressive(
                lambda c, x, _r: step(c, x, None), carry0, n, cfg.num_mels,
                cfg.outputs_per_step, cfg.max_iters,
                stop_threshold=cfg.get("stop_threshold", 0.0),
                initial_finished=input_lengths < 1)

        decoder_out = D.assemble_outputs(outs, cfg.num_mels)
        alignments = D.assemble_alignments(aligns)
        guided = D.maybe_guided_attention(
            cfg, alignments, input_lengths, mel_targets, is_training)

        residual, post_state = M.postnet(
            params["postnet"], state["postnet"], decoder_out, is_training)
        mel_outputs = decoder_out + residual

        exp_z = None if deferred_zs is None else deferred_zs.get("expand_lstm")
        if exp_z is not None:
            expand_out, expand_state, extra_aux["expand_lstm"] = (
                M.conv_and_lstm(
                    params["expand"], state["expand"], self._expand_meta,
                    mel_outputs, None, is_training, z=exp_z))
        else:
            expand_out, expand_state = M.conv_and_lstm(
                params["expand"], state["expand"], self._expand_meta,
                mel_outputs, None, is_training)
        linear_outputs = L.dense(params["linear_proj"], expand_out)

        outputs = {
            "mel_outputs": mel_outputs,
            "linear_outputs": linear_outputs,
            "alignments": alignments,
        }
        if lengths is not None:
            outputs["decoder_steps"] = lengths
        if deferred_aux is not None:
            outputs["deferred_inputs"] = {**deferred_aux, **extra_aux}
        if guided is not None:
            outputs["guided_attention"] = guided
        new_state = {"encoder": enc_state, "postnet": post_state,
                     "expand": expand_state}
        return outputs, new_state

    # -- loss (reference: tacotron2.py:130-139; 2 kHz priority band) ---------

    def loss(self, outputs, mel_targets, linear_targets):
        cfg = self.cfg
        mel_loss = jnp.mean(jnp.abs(mel_targets - outputs["mel_outputs"]))
        l1 = jnp.abs(linear_targets - outputs["linear_outputs"])
        n_priority = int(2000 / (cfg.sample_rate * 0.5) * cfg.num_freq)
        linear_loss = 0.5 * jnp.mean(l1) + 0.5 * jnp.mean(l1[:, :, :n_priority])
        loss = mel_loss + linear_loss
        from nspeech_tpu.models.tacotron import _attention_sharpness

        metrics = {"loss_mel": mel_loss, "loss_linear": linear_loss,
                   "attention_sharpness": _attention_sharpness(outputs)}
        loss = D.apply_guided_loss(cfg, outputs, loss, metrics)
        metrics["loss"] = loss
        return loss, metrics
