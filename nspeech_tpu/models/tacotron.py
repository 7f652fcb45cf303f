"""Tacotron-1: CBHG seq2seq text-to-spectrogram model.

TPU-native rebuild of the reference model
(reference: neural_speech/models/tacotron.py): char embedding -> encoder
prenet -> encoder CBHG -> attention decoder (GRU attention cell + 2 residual
GRUs, r frames per step) -> post-CBHG -> linear spectrogram. The decoder is
a single fused ``lax.scan`` step (prenet + attention + GRU stack + frame
projection), replacing the dynamic_decode/Helper machinery
(tacotron.py:65-86) — SURVEY.md §7.3.

Composition quirk preserved from the reference: the decoder prenet is
applied to the concatenation [input frame; previous attention context]
(AttentionWrapper's cell_input_fn feeds PrenetWrapper), not to the frame
alone as in the published Tacotron paper.
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


class Tacotron1:
    name = "taco1"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.multi_speaker = cfg.num_speakers > 1
        # Shape metadata is derived from config alone so a model restored
        # from a checkpoint never depends on init() having run.
        self._enc_meta = {"K": cfg.encoder_cbhg_banks, "gru_units": 128,
                          "in_dim": cfg.encoder_prenet[-1]}
        self._post_meta = {"K": cfg.post_cbhg_banks, "gru_units": 128,
                           "in_dim": cfg.num_mels}

    # -- parameters -----------------------------------------------------------

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

        params["encoder_prenet"] = L.init_prenet(
            next(keys), cfg.embedding_dim, cfg.encoder_prenet)
        enc_in = cfg.encoder_prenet[-1]
        params["encoder_cbhg"], state["encoder_cbhg"], _ = M.init_cbhg(
            next(keys), enc_in, cfg.encoder_cbhg_banks,
            list(cfg.encoder_cbhg_bank_sizes), speaker_dim=spk_dim)
        memory_dim = 2 * self._enc_meta["gru_units"]  # 256

        params["attention"] = A.init_attention(
            next(keys), cfg.attention_type, cfg.attention_dim, memory_dim,
            query_dim=cfg.attention_dim)

        # Decoder prenet input: [frame (M); previous context (memory_dim)].
        params["decoder_prenet"] = L.init_prenet(
            next(keys), M_dim + memory_dim, [256, 128])
        attn_in = 128
        if self.multi_speaker:
            params["spk_prenet"] = L.init_dense(next(keys), spk_dim, 128)
            attn_in += 128
        params["attn_gru"] = L.init_gru(next(keys), attn_in, cfg.attention_dim)
        # OutputProjectionWrapper(attention_cell, decoder_dim) (tacotron.py:70)
        params["out_proj"] = L.init_dense(
            next(keys), cfg.attention_dim + memory_dim, cfg.decoder_dim)
        params["gru2"] = L.init_gru(next(keys), cfg.decoder_dim, cfg.decoder_dim)
        params["gru3"] = L.init_gru(next(keys), cfg.decoder_dim, cfg.decoder_dim)
        params["frame_proj"] = L.init_dense(next(keys), cfg.decoder_dim, M_dim * r)

        params["post_cbhg"], state["post_cbhg"], _ = M.init_cbhg(
            next(keys), M_dim, cfg.post_cbhg_banks,
            list(cfg.post_cbhg_bank_sizes) + [M_dim], speaker_dim=None)
        params["linear_proj"] = L.init_dense(
            next(keys), 2 * self._post_meta["gru_units"], cfg.num_freq)
        return params, state

    # -- decoder step ---------------------------------------------------------

    def _make_step(self, params, keys_mem, values, mask, spk,
                   is_training: bool, deferred: bool = False):
        cfg = self.cfg
        att_type = cfg.attention_type
        drop = cfg.drop_rate if is_training else 0.0
        win_fwd = int(cfg.get("attention_win_fwd", 0))
        win_back = int(cfg.get("attention_win_back", 1))
        windowed = (not is_training) and win_fwd > 0

        def step(carry, x, rng_t, zs=None):
            h1, context, align, h2, h3 = carry
            cell_in = jnp.concatenate([x, context], axis=-1)
            pre = L.prenet(params["decoder_prenet"], cell_in, drop, rng_t)
            if spk is not None:
                s = L.dense(params["spk_prenet"], spk, softsign)
                pre = jnp.concatenate([pre, s], axis=-1)
            if deferred:
                aux = {}

                def gru(name, p, x_in, h):
                    h_new, xh, xrh = DF.gru_cell_deferred(
                        p, x_in, h, zs[name + "_gate"], zs[name + "_cand"])
                    aux[name + "_gate"], aux[name + "_cand"] = xh, xrh
                    return h_new

                h1 = gru("attn_gru", params["attn_gru"], pre, h1)
                m = (A.window_mask(align, mask, win_back, win_fwd)
                     if windowed else mask)
                context, align = A.attention_step(
                    params["attention"], att_type, h1, align, keys_mem,
                    values, m)
                concat_out = jnp.concatenate([h1, context], axis=-1)
                proj, aux["out_proj"] = DF.dense_deferred(
                    params["out_proj"], concat_out, zs["out_proj"])
                g2 = gru("gru2", params["gru2"], proj, h2)
                o2 = proj + g2
                g3 = gru("gru3", params["gru3"], o2, h3)
                o3 = o2 + g3
                out, aux["frame_proj"] = DF.dense_deferred(
                    params["frame_proj"], o3, zs["frame_proj"])
                return (h1, context, align, g2, g3), (out, align, aux)
            h1 = L.gru_cell(params["attn_gru"], pre, h1)
            m = (A.window_mask(align, mask, win_back, win_fwd)
                 if windowed else mask)
            context, align = A.attention_step(
                params["attention"], att_type, h1, align, keys_mem, values, m)
            concat_out = jnp.concatenate([h1, context], axis=-1)
            proj = L.dense(params["out_proj"], concat_out)
            g2 = L.gru_cell(params["gru2"], proj, h2)
            o2 = proj + g2
            g3 = L.gru_cell(params["gru3"], o2, h3)
            o3 = o2 + g3
            out = L.dense(params["frame_proj"], o3)
            return (h1, context, align, g2, g3), (out, align)

        return step

    def deferred_zero_inputs(self, batch: int, steps: int,
                             t_in: int = None, t_out: int = None):
        """Zero per-step injection tensors for deferred-dW training (see
        ops/deferred.py). ``t_in``/``t_out`` are accepted for train-loop
        signature parity with Tacotron-2; the CBHG BiGRUs keep the naive
        scan transpose (their recurrent kernels are [128, ...] — the
        accumulator RMW is not a measurable cost)."""
        del t_in, t_out
        cfg = self.cfg
        z = jnp.zeros
        zs = {}
        for name, units in (("attn_gru", cfg.attention_dim),
                            ("gru2", cfg.decoder_dim),
                            ("gru3", cfg.decoder_dim)):
            zs[name + "_gate"] = z((steps, batch, 2 * units))
            zs[name + "_cand"] = z((steps, batch, units))
        zs["out_proj"] = z((steps, batch, cfg.decoder_dim))
        zs["frame_proj"] = z((steps, batch,
                              cfg.num_mels * cfg.outputs_per_step))
        return zs

    def deferred_param_grads(self, aux, dzs):
        """Post-hoc {param_name: grads} from the stacked scan activations
        (aux) and injection cotangents (dzs)."""
        g = {}
        for cell in ("attn_gru", "gru2", "gru3"):
            d = DF.matmul_grads(aux[cell + "_gate"], dzs[cell + "_gate"],
                                "gate_kernel", "gate_bias")
            d.update(DF.matmul_grads(aux[cell + "_cand"], dzs[cell + "_cand"],
                                     "cand_kernel", "cand_bias"))
            g[cell] = d
        for name in ("out_proj", "frame_proj"):
            g[name] = DF.matmul_grads(aux[name], dzs[name])
        return g

    def deferred_merge_grads(self, grads, aux, dzs):
        """Fill the stop_gradient'ed weight grads in ``grads`` from the
        stacked scan activations (aux) and injection cotangents (dzs)."""
        for name, g in self.deferred_param_grads(aux, dzs).items():
            grads[name] = {k: v for k, v in g.items() if k in grads[name]}
        return grads

    def _decoder_carry0(self, batch: int, t_in: int, dtype=jnp.float32):
        cfg = self.cfg
        memory_dim = 2 * self._enc_meta["gru_units"]
        return (
            jnp.zeros((batch, cfg.attention_dim), dtype),
            jnp.zeros((batch, memory_dim), dtype),
            A.initial_alignments(cfg.attention_type, batch, t_in, dtype),
            jnp.zeros((batch, cfg.decoder_dim), dtype),
            jnp.zeros((batch, cfg.decoder_dim), dtype),
        )

    # -- forward --------------------------------------------------------------

    def encode(self, params, state, text_inputs, input_lengths, speaker_ids,
               is_training: bool, rng):
        cfg = self.cfg
        embedded = L.embedding(params["embedding"], text_inputs)
        spk = None
        if self.multi_speaker:
            spk = jnp.take(params["speaker_embed"]["table"], speaker_ids, axis=0)
        pre = L.prenet(params["encoder_prenet"], embedded,
                       cfg.drop_rate if is_training else 0.0, rng)
        enc_out, enc_state = M.cbhg(
            params["encoder_cbhg"], state["encoder_cbhg"], self._enc_meta,
            pre, input_lengths, spk, is_training)
        return enc_out, spk, enc_state

    # -- streaming hooks ------------------------------------------------------

    def attention_context(self, params, state, text_inputs, input_lengths,
                          speaker_ids=None):
        """Encoder side only (inference): ``(step_ctx, carry0)`` for
        chunked decoding (see tacotron2.attention_context). Tacotron-1's
        decoder frames ARE the mel (no postnet residual)."""
        n, t_in = text_inputs.shape
        dtype = P.compute_dtype(self.cfg)
        params = P.cast_floats(params, dtype)
        enc_out, spk, _ = self.encode(
            params, state, text_inputs, input_lengths, speaker_ids,
            False, jax.random.PRNGKey(0))
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

    def forward(
        self,
        params,
        state,
        text_inputs: jnp.ndarray,          # [N, T_in] int32
        input_lengths: jnp.ndarray,        # [N]
        speaker_ids: Optional[jnp.ndarray] = None,
        mel_targets: Optional[jnp.ndarray] = None,  # [N, T_out, M] (training)
        is_training: bool = False,
        rng: Optional[jnp.ndarray] = None,
        deferred_zs=None,
    ):
        """Returns (outputs dict, new_bn_state). Training mode iff
        mel_targets is given and is_training."""
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng_enc, rng_dec = jax.random.split(rng)
        n, t_in = text_inputs.shape

        # Mixed-precision entry (ops/policy.py): f32 masters stay outside;
        # the cast's autodiff transpose returns f32 grads to them.
        dtype = P.compute_dtype(cfg)
        params = P.cast_floats(params, dtype)
        mel_targets = P.cast_floats(mel_targets, dtype)
        deferred_zs = P.cast_floats(deferred_zs, dtype)

        enc_out, spk, enc_state = self.encode(
            params, state, text_inputs, input_lengths, speaker_ids,
            is_training, rng_enc)
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
                outs, aligns, deferred_aux = D.scan_teacher_deferred(
                    step, carry0, inputs, deferred_zs, rng_dec,
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

        mel_outputs = D.assemble_outputs(outs, cfg.num_mels)
        alignments = D.assemble_alignments(aligns)
        guided = D.maybe_guided_attention(
            cfg, alignments, input_lengths, mel_targets, is_training)

        post_out, post_state = M.cbhg(
            params["post_cbhg"], state["post_cbhg"], self._post_meta,
            mel_outputs, None, None, is_training)
        linear_outputs = L.dense(params["linear_proj"], post_out)

        outputs = {
            "mel_outputs": mel_outputs,
            "linear_outputs": linear_outputs,
            "alignments": alignments,
        }
        if lengths is not None:
            outputs["decoder_steps"] = lengths
        if deferred_aux is not None:
            outputs["deferred_inputs"] = deferred_aux
        if guided is not None:
            outputs["guided_attention"] = guided
        new_state = {"encoder_cbhg": enc_state, "post_cbhg": post_state}
        return outputs, new_state

    # -- loss (reference: tacotron.py:124-133) --------------------------------

    def loss(self, outputs, mel_targets, linear_targets):
        cfg = self.cfg
        mel_loss = jnp.mean(jnp.abs(mel_targets - outputs["mel_outputs"]))
        l1 = jnp.abs(linear_targets - outputs["linear_outputs"])
        n_priority = int(3000 / (cfg.sample_rate * 0.5) * cfg.num_freq)
        linear_loss = 0.5 * jnp.mean(l1) + 0.5 * jnp.mean(l1[:, :, :n_priority])
        loss = mel_loss + linear_loss
        metrics = {"loss_mel": mel_loss, "loss_linear": linear_loss,
                   "attention_sharpness": _attention_sharpness(outputs)}
        loss = D.apply_guided_loss(cfg, outputs, loss, metrics)
        metrics["loss"] = loss
        return loss, metrics


def _attention_sharpness(outputs) -> jnp.ndarray:
    """Mean peak alignment weight per decoder step. Collapsed attention —
    the failure mode the reference documents with a restart-from-checkpoint
    procedure (reference README.md:75-80) — shows up as this dropping
    toward 1/T_in, so it is surfaced as a training metric."""
    return jnp.mean(jnp.max(outputs["alignments"], axis=1))
