"""WaveNet: gated dilated causal convolution autoregressive audio model.

One parameterized TPU-native implementation replacing the reference's two
near-duplicate classes (reference: neural_speech/models/wavenet.py and
wavenet_simple.py — ~550 shared lines; SURVEY.md §2.2 note (a)).

Training: dilated causal convs are plain ``lax.conv_general_dilated`` with
VALID framing (XLA maps them to the MXU directly; the reference's
time-to-batch reshuffle, wavenet.py:765-797, is unnecessary under XLA).
Global (speaker) and local (mel) conditioning are supported in BOTH training
and generation — the reference's generator silently ignored local
conditioning (wavenet.py:398; SURVEY.md §2.2 note (c)).

Generation: the reference ran one session call per audio sample through
per-layer FIFO queues (generate_wavenet.py:109-122, wavenet.py:487-557).
Here the fast-wavenet algorithm is a single ``lax.scan`` over output samples
with per-layer on-device ring buffers — one device dispatch for the whole
utterance. A Pallas VMEM-resident kernel is layered on top for peak
sampling throughput (ops/pallas/wavenet_gen.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import Config
from nspeech_tpu.dsp.mulaw import mu_law_encode
from nspeech_tpu.ops import policy as P
from nspeech_tpu.ops.layers import acc_einsum, glorot_uniform

Params = Dict[str, Any]


def calculate_receptive_field(filter_width: int, dilations, scalar_input: bool,
                              initial_filter_width: int) -> int:
    """Same formula as the reference (wavenet.py:126-134)."""
    receptive_field = (filter_width - 1) * sum(dilations) + 1
    if scalar_input:
        receptive_field += initial_filter_width - 1
    else:
        receptive_field += filter_width - 1
    return receptive_field


def _conv_init(key, shape) -> jnp.ndarray:
    """Xavier-uniform for conv weights [W, Cin, Cout]."""
    fan_in = shape[0] * shape[1]
    fan_out = shape[0] * shape[2]
    return glorot_uniform(key, shape, fan_in, fan_out)


class WaveNet:
    name = "wavenet"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.dilations = [
            2 ** i for _ in range(cfg.dilations_depth)
            for i in range(cfg.dilations_length)
        ]
        self.filter_width = cfg.filter_width
        self.residual_channels = cfg.residual_channels
        self.dilation_channels = cfg.dilation_channels
        self.quantization_channels = cfg.quantization_channels
        self.skip_channels = cfg.skip_channels
        self.use_biases = bool(cfg.use_biases)
        self.scalar_input = bool(cfg.scalar_input)
        self.initial_filter_width = cfg.initial_filter_width
        self.gc_channels = cfg.gc_channels or 0
        self.gc_cardinality = cfg.gc_category_cardinality or 0
        self.lc_channels = cfg.lc_channels or 0
        self.receptive_field = calculate_receptive_field(
            self.filter_width, self.dilations, self.scalar_input,
            self.initial_filter_width)

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def init(self, key) -> Params:
        fw = self.filter_width
        R, DC, Q, S = (self.residual_channels, self.dilation_channels,
                       self.quantization_channels, self.skip_channels)
        n_layers = len(self.dilations)
        keys = iter(jax.random.split(key, 8 * n_layers + 8))
        params: Params = {}

        if self.gc_channels and self.gc_cardinality:
            if self.gc_cardinality == self.gc_channels:
                table = jnp.eye(self.gc_cardinality)  # one-hot init (wavenet.py:20-26)
            else:
                table = _conv_init(next(keys), (1, self.gc_cardinality,
                                                self.gc_channels))[0]
            params["gc_embedding"] = table

        if self.scalar_input:
            params["causal"] = _conv_init(
                next(keys), (self.initial_filter_width, 1, R))
        else:
            params["causal"] = _conv_init(next(keys), (fw, Q, R))

        layers = []
        for _ in self.dilations:
            lp = {
                "filter": _conv_init(next(keys), (fw, R, DC)),
                "gate": _conv_init(next(keys), (fw, R, DC)),
                "dense": _conv_init(next(keys), (1, DC, R)),
                "skip": _conv_init(next(keys), (1, DC, S)),
            }
            if self.gc_channels:
                lp["gc_filter"] = _conv_init(next(keys), (1, self.gc_channels, DC))
                lp["gc_gate"] = _conv_init(next(keys), (1, self.gc_channels, DC))
            if self.lc_channels:
                lp["lc_filter"] = _conv_init(next(keys), (1, self.lc_channels, DC))
                lp["lc_gate"] = _conv_init(next(keys), (1, self.lc_channels, DC))
            if self.use_biases:
                lp["filter_bias"] = jnp.zeros((DC,))
                lp["gate_bias"] = jnp.zeros((DC,))
                lp["dense_bias"] = jnp.zeros((R,))
                lp["skip_bias"] = jnp.zeros((S,))
            layers.append(lp)
        params["layers"] = layers

        params["post1"] = _conv_init(next(keys), (1, S, S))
        params["post2"] = _conv_init(next(keys), (1, S, Q))
        if self.use_biases:
            params["post1_bias"] = jnp.zeros((S,))
            params["post2_bias"] = jnp.zeros((Q,))
        return params

    # ------------------------------------------------------------------
    # Training network (full convolution)
    # ------------------------------------------------------------------

    def _causal_conv(self, x, w, dilation: int):
        fw = w.shape[0]
        if fw <= 4:
            # Shifted-slice einsum formulation: y_t = sum_k x_{t+k*d} @ W_k.
            # Identical math to the dilated VALID conv, but lowers to plain
            # MXU matmuls — measured ~20% faster per train step than
            # conv_general_dilated for these narrow (32->64 ch) convs,
            # whose conv lowering picks a worse layout.
            t_out = x.shape[1] - dilation * (fw - 1)
            out = None
            for k in range(fw):
                seg = jax.lax.dynamic_slice_in_dim(
                    x, k * dilation, t_out, axis=1)
                term = acc_einsum("ntc,co->nto", seg, w[k])
                out = term if out is None else out + term
            return out
        # conv transpose rejects mixed-dtype cotangents — only request f32
        # accumulation when the compute dtype IS f32 (see ops.layers.conv1d)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="VALID",
            rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                    else None))

    def _network(self, params: Params, x: jnp.ndarray,
                 gc: Optional[jnp.ndarray], lc: Optional[jnp.ndarray]):
        """x: [N, T_in, C_in] network input. Returns logits
        [N, T_in - RF + 1, Q]. ``lc`` is per-sample local conditioning
        aligned with x ([N, T_in, lc_channels])."""
        x = self._causal_conv(
            x, params["causal"],
            1)
        shrink = (self.initial_filter_width if self.scalar_input
                  else self.filter_width) - 1
        return self._network_body(params, x, gc, lc, shrink)

    def _network_body(self, params: Params, x: jnp.ndarray,
                      gc: Optional[jnp.ndarray], lc: Optional[jnp.ndarray],
                      shrink: int):
        """Dilated stack + skip reduction + post network. ``x`` is the
        output of the initial causal conv; ``shrink`` is how many leading
        samples that conv consumed (aligns ``lc`` slices)."""
        fw = self.filter_width
        output_width = x.shape[1] - sum(self.dilations) * (fw - 1)

        skip_outs = []
        current = x
        dc = self.dilation_channels
        for lp, dilation in zip(params["layers"], self.dilations):
            # One fused conv/einsum computes the filter AND gate halves
            # (checkpoint layout untouched: kernels concatenate on the
            # output axis at apply time) — halves the per-layer reads of
            # `current`/`lc` and the op count on the layer chain.
            w_fg = jnp.concatenate([lp["filter"], lp["gate"]], axis=2)
            conv_fg = self._causal_conv(current, w_fg, dilation)
            shrink += dilation * (fw - 1)
            if gc is not None:
                w_gc = jnp.concatenate([lp["gc_filter"][0],
                                        lp["gc_gate"][0]], axis=1)
                conv_fg = conv_fg + jnp.einsum("nc,co->no", gc,
                                               w_gc)[:, None, :]
            if lc is not None:
                # Align conditioning with this layer's output positions: the
                # causal VALID convs consume `shrink` leading samples so far.
                lc_layer = lc[:, shrink:, :]
                w_lc = jnp.concatenate([lp["lc_filter"][0],
                                        lp["lc_gate"][0]], axis=1)
                conv_fg = conv_fg + jnp.einsum("ntc,co->nto", lc_layer, w_lc)
            if self.use_biases:
                conv_fg = conv_fg + jnp.concatenate([lp["filter_bias"],
                                                     lp["gate_bias"]])
            conv_f, conv_g = conv_fg[..., :dc], conv_fg[..., dc:]
            out = jnp.tanh(conv_f) * jax.nn.sigmoid(conv_g)

            transformed = jnp.einsum("ntc,co->nto", out, lp["dense"][0])
            if self.use_biases:
                transformed = transformed + lp["dense_bias"]
            skip_outs.append(out[:, -output_width:, :])
            current = current[:, -transformed.shape[1]:, :] + transformed

        # Skip reduction as ONE layer-stacked matmul. Accumulating the
        # [N, T, skip_channels] skip sum per layer read-modify-writes a
        # ~170 MB fp32 accumulator 50 times per step (and re-reads its
        # cotangent 50 times in the transpose) — ~30 GB of HBM traffic at
        # the default config. sum_l out_l @ W_l == stack_l(out_l) @
        # concat_l(W_l): same FLOPs, one K=L*R contraction, accumulator
        # touched once.
        skips = acc_einsum(
            "lnto,loc->ntc", jnp.stack(skip_outs),
            jnp.stack([lp["skip"][0] for lp in params["layers"]]))
        if self.use_biases:
            skips = skips + sum(lp["skip_bias"] for lp in params["layers"])

        h = jax.nn.relu(skips)
        h = jnp.einsum("ntc,co->nto", h, params["post1"][0])
        if self.use_biases:
            h = h + params["post1_bias"]
        h = jax.nn.relu(h)
        logits = jnp.einsum("ntc,co->nto", h, params["post2"][0])
        if self.use_biases:
            logits = logits + params["post2_bias"]
        return logits

    def _embed_gc(self, params: Params, gc_ids: Optional[jnp.ndarray]):
        if gc_ids is None or not self.gc_channels:
            return None
        return jnp.take(params["gc_embedding"], gc_ids, axis=0)

    def forward_train(
        self,
        params: Params,
        audio: jnp.ndarray,                  # [N, T] float waveform window
        gc_ids: Optional[jnp.ndarray] = None,  # [N] int32 speaker ids
        lc: Optional[jnp.ndarray] = None,      # [N, T, lc_channels]
    ):
        """Returns (logits [N, T-RF, Q], target codes [N, T-RF])."""
        Q = self.quantization_channels
        # Mixed-precision entry (ops/policy.py): cast params + float
        # conditioning; accumulation stays f32 (see _causal_conv), the
        # loss upcasts the logits.
        dtype = P.compute_dtype(self.cfg)
        params = P.cast_floats(params, dtype)
        lc = P.cast_floats(lc, dtype)
        encoded = mu_law_encode(audio, Q)          # [N, T]
        lc_in = lc[:, :-1, :] if lc is not None else None
        gc = self._embed_gc(params, gc_ids)
        if self.scalar_input:
            net_in = audio[:, :-1, None].astype(dtype)
            logits = self._network(params, net_in, gc, lc_in)
        else:
            # The width-2 causal conv over a one-hot input is two embedding
            # lookups: y_t = W[0][c_t] + W[1][c_{t+1}]. Gather instead of
            # materializing the [N, T, Q] fp32 one-hot (~100 MB at the
            # default training window) and convolving it.
            logits = self._network_embedded(params, encoded[:, :-1], gc,
                                            lc_in)
        targets = encoded[:, self.receptive_field:]
        return logits, targets

    def _network_embedded(self, params: Params, codes: jnp.ndarray,
                          gc, lc) -> jnp.ndarray:
        """_network with the initial one-hot causal conv replaced by
        gathers from the same kernel (exact same math)."""
        fw = self.filter_width
        w = params["causal"]                        # [fw, Q, R]
        t_out = codes.shape[1] - fw + 1
        x = sum(jnp.take(w[k], codes[:, k: k + t_out], axis=0)
                for k in range(fw))
        return self._network_body(params, x, gc, lc, shrink=fw - 1)

    def loss(self, logits: jnp.ndarray, targets: jnp.ndarray,
             params: Optional[Params] = None,
             l2_strength: Optional[float] = None):
        # Cross-entropy in f32 whatever the compute dtype (ops/policy.py).
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        loss = jnp.mean(ce)
        metrics = {"loss": loss}
        if l2_strength and params is not None:
            # Exclude every leaf whose key path mentions 'bias', matching the
            # reference's name-based exclusion (wavenet.py:716-718).
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            leaves = [v for path, v in flat
                      if "bias" not in jax.tree_util.keystr(path)]
            l2 = sum(jnp.sum(jnp.square(w)) for w in leaves) * 0.5
            metrics["l2_loss"] = l2
            loss = loss + l2_strength * l2
            metrics["total_loss"] = loss
        return loss, metrics

    def predict_logits(self, params: Params, codes: jnp.ndarray,
                       gc_ids=None, lc=None) -> jnp.ndarray:
        """Full-window scoring: mu-law codes [N, T] -> logits [N, T-RF+1, Q]
        (the reference's slow predict_proba path, wavenet.py:610-632)."""
        one_hot = jax.nn.one_hot(codes, self.quantization_channels, dtype=jnp.float32)
        gc = self._embed_gc(params, gc_ids)
        return self._network(params, one_hot, gc, lc)

    # ------------------------------------------------------------------
    # Fast generation: one lax.scan over samples with ring buffers
    # ------------------------------------------------------------------

    def _init_gen_buffers(self, batch: int):
        Q, R = self.quantization_channels, self.residual_channels
        causal_buf = jnp.zeros((1, batch, Q))
        layer_bufs = tuple(
            jnp.zeros((d, batch, R)) for d in self.dilations
        )
        return causal_buf, layer_bufs

    def _gen_step(self, params: Params, x: jnp.ndarray, t: jnp.ndarray,
                  bufs, gc: Optional[jnp.ndarray],
                  lc_t: Optional[jnp.ndarray]):
        """One autoregressive step on one-hot input x [N, Q].

        bufs holds, per layer, the past inputs needed by its width-2 dilated
        conv (the fast-wavenet queues, wavenet.py:487-557, as ring buffers
        indexed by t mod dilation). Returns (logits [N, Q], new bufs).
        """
        causal_buf, layer_bufs = bufs
        w = params["causal"]
        past = causal_buf[0]
        current = jnp.dot(past, w[0], preferred_element_type=jnp.float32) + \
            jnp.dot(x, w[1], preferred_element_type=jnp.float32)
        new_causal = causal_buf.at[0].set(x)

        skips = None
        new_layer_bufs = []
        for i, (lp, dilation) in enumerate(zip(params["layers"], self.dilations)):
            buf = layer_bufs[i]
            slot = jax.lax.rem(t, dilation)
            state = jax.lax.dynamic_index_in_dim(buf, slot, 0, keepdims=False)
            out_f = jnp.dot(state, lp["filter"][0], preferred_element_type=jnp.float32) + \
                jnp.dot(current, lp["filter"][1], preferred_element_type=jnp.float32)
            out_g = jnp.dot(state, lp["gate"][0], preferred_element_type=jnp.float32) + \
                jnp.dot(current, lp["gate"][1], preferred_element_type=jnp.float32)
            if gc is not None:
                out_f = out_f + jnp.dot(gc, lp["gc_filter"][0])
                out_g = out_g + jnp.dot(gc, lp["gc_gate"][0])
            if lc_t is not None:
                out_f = out_f + jnp.dot(lc_t, lp["lc_filter"][0])
                out_g = out_g + jnp.dot(lc_t, lp["lc_gate"][0])
            if self.use_biases:
                out_f = out_f + lp["filter_bias"]
                out_g = out_g + lp["gate_bias"]
            out = jnp.tanh(out_f) * jax.nn.sigmoid(out_g)
            transformed = jnp.dot(out, lp["dense"][0])
            skip = jnp.dot(out, lp["skip"][0])
            if self.use_biases:
                transformed = transformed + lp["dense_bias"]
                skip = skip + lp["skip_bias"]
            skips = skip if skips is None else skips + skip
            new_layer_bufs.append(
                jax.lax.dynamic_update_index_in_dim(buf, current, slot, 0))
            current = current + transformed

        h = jax.nn.relu(skips)
        h = jnp.dot(h, params["post1"][0])
        if self.use_biases:
            h = h + params["post1_bias"]
        h = jax.nn.relu(h)
        logits = jnp.dot(h, params["post2"][0])
        if self.use_biases:
            logits = logits + params["post2_bias"]
        return logits, (new_causal, tuple(new_layer_bufs))

    def generate(
        self,
        params: Params,
        n_samples: int,
        key,
        batch: int = 1,
        gc_ids: Optional[jnp.ndarray] = None,
        lc: Optional[jnp.ndarray] = None,       # [N, n_samples, lc_channels]
        seed_codes: Optional[jnp.ndarray] = None,  # [N, T_seed] priming codes
        temperature: float = 1.0,
        return_logits: bool = False,
        include_prime: bool = False,
    ):
        """Autoregressive sampling, whole utterance in ONE device dispatch.

        Returns mu-law codes [N, n_samples] (and per-step logits if
        requested). Priming replays ``seed_codes`` through the buffers
        before free-running (generate_wavenet.py:91-106 semantics).
        """
        if self.scalar_input or self.filter_width != 2:
            raise NotImplementedError(
                "Fast generation supports filter_width=2 one-hot models "
                "(same restriction as the reference, wavenet.py:639-644).")
        if self.lc_channels and lc is None:
            raise ValueError(
                "model has lc_channels=%d; pass lc= (per-sample local "
                "conditioning) to generate" % self.lc_channels)
        if lc is not None and not self.lc_channels:
            raise ValueError(
                "lc given but model has lc_channels=0 — it would be "
                "silently ignored (the reference's defect, wavenet.py:398)")
        Q = self.quantization_channels
        gc = self._embed_gc(params, gc_ids)
        bufs = self._init_gen_buffers(batch)

        prime_len = 0
        if seed_codes is not None:
            prime_len = int(seed_codes.shape[1])
        total = prime_len + n_samples

        if seed_codes is not None:
            forced = jnp.concatenate(
                [seed_codes.astype(jnp.int32),
                 jnp.zeros((batch, n_samples), jnp.int32)], axis=1)
        else:
            forced = jnp.zeros((batch, total), jnp.int32)
        forced = jnp.moveaxis(forced, 1, 0)  # [total, N]

        if lc is not None:
            if lc.shape[1] < total:
                lc = jnp.pad(lc, ((0, 0), (0, total - lc.shape[1]), (0, 0)))
            lc_steps = jnp.moveaxis(lc[:, :total, :], 1, 0)
        else:
            lc_steps = jnp.zeros((total, batch, 0))

        # First input: silence code (mid-scale), as the reference seeds with
        # quantization_channels/2 (generate_wavenet.py:88).
        x0 = jnp.full((batch,), Q // 2, jnp.int32)
        keys = jax.random.split(key, total)

        def body(carry, xs):
            t, prev_code, bufs = carry
            forced_t, lc_t, k = xs
            code_in = jnp.where(t < prime_len, forced_t, prev_code)
            x = jax.nn.one_hot(code_in, Q, dtype=jnp.float32)
            logits, bufs = self._gen_step(
                params, x, t, bufs, gc, lc_t if self.lc_channels else None)
            if temperature <= 0.0:
                # deterministic argmax decode (first-index tie-break, the
                # same rule as the Pallas kernel's deterministic path)
                sample = jnp.argmax(logits, axis=-1)
            else:
                sample = jax.random.categorical(
                    k, logits / temperature, axis=-1)
            sample = sample.astype(jnp.int32)
            return (t + 1, sample, bufs), (sample, logits if return_logits else None)

        (_, _, _), (samples, logits) = jax.lax.scan(
            body, (jnp.asarray(0, jnp.int32), x0, bufs),
            (forced, lc_steps, keys))
        # The emission at scan step t is the prediction for time t+1, so the
        # first free-running sample (time prime_len) is emitted at step
        # prime_len-1 — skip prime_len-1 steps, then keep n_samples.
        skip = 0 if include_prime else max(prime_len - 1, 0)
        end = None if include_prime else skip + n_samples
        samples = jnp.moveaxis(samples, 0, 1)[:, skip:end]
        if return_logits:
            return samples, jnp.moveaxis(logits, 0, 1)[:, skip:end]
        return samples

    # -- chunked (streaming) generation --------------------------------------

    def generate_carry0(self, batch: int = 1):
        """Initial carry for :meth:`generate_chunk`: (t, prev_code, ring
        buffers), prev_code seeded with the mid-scale silence code like
        :meth:`generate`."""
        Q = self.quantization_channels
        return (jnp.asarray(0, jnp.int32),
                jnp.full((batch,), Q // 2, jnp.int32),
                self._init_gen_buffers(batch))

    def generate_chunk(
        self,
        params: Params,
        carry,
        n_samples: int,
        key,
        gc_ids: Optional[jnp.ndarray] = None,
        lc: Optional[jnp.ndarray] = None,   # [N, n_samples, lc_channels]
        temperature: float = 1.0,
    ):
        """Run ``n_samples`` sampling steps from ``carry`` and return
        (codes [N, n_samples], carry) — the streaming form of
        :meth:`generate`: concatenating chunks reproduces the one-shot
        call exactly at temperature<=0 (argmax; tested). At temperature>0
        each step draws from ``fold_in(key, t)`` with t the ABSOLUTE
        sample index carried across chunks, so resuming mid-utterance is
        deterministic in (key, t) rather than in a pre-split key vector.
        """
        if self.scalar_input or self.filter_width != 2:
            raise NotImplementedError(
                "Fast generation supports filter_width=2 one-hot models "
                "(same restriction as the reference, wavenet.py:639-644).")
        if self.lc_channels and lc is None:
            raise ValueError("model has lc_channels=%d; pass lc= to "
                             "generate_chunk" % self.lc_channels)
        if lc is not None and not self.lc_channels:
            raise ValueError(
                "lc given but model has lc_channels=0 — it would be "
                "silently ignored (the reference's defect, wavenet.py:398)")
        Q = self.quantization_channels
        gc = self._embed_gc(params, gc_ids)
        batch = carry[1].shape[0]
        if lc is not None:
            lc_steps = jnp.moveaxis(lc[:, :n_samples, :], 1, 0)
        else:
            lc_steps = jnp.zeros((n_samples, batch, 0))

        def body(carry, lc_t):
            t, prev_code, bufs = carry
            x = jax.nn.one_hot(prev_code, Q, dtype=jnp.float32)
            logits, bufs = self._gen_step(
                params, x, t, bufs, gc, lc_t if self.lc_channels else None)
            if temperature <= 0.0:
                sample = jnp.argmax(logits, axis=-1)
            else:
                sample = jax.random.categorical(
                    jax.random.fold_in(key, t), logits / temperature,
                    axis=-1)
            sample = sample.astype(jnp.int32)
            return (t + 1, sample, bufs), sample

        carry, samples = jax.lax.scan(body, carry, lc_steps)
        return jnp.moveaxis(samples, 0, 1), carry
