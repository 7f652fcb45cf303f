"""Attention mechanisms for the Tacotron decoders.

Functional rebuild of the reference's six-mechanism factory
(reference: neural_speech/models/utils/modules.py:61-106 and
neural_speech/models/utils/attention.py): bah, bah_mon, bah_norm, luong,
luong_scaled, location_sensitive. Scoring math mirrors the TF seq2seq
implementations so behavior is comparable; everything is a pure function
usable inside a ``lax.scan`` decoder step (keys are precomputed once per
utterance outside the scan).

State carried between decoder steps is the previous alignment vector
(used by location_sensitive and bah_mon; ignored by the others).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nspeech_tpu.ops.layers import (
    Params,
    conv1d,
    dense,
    glorot_uniform,
    init_conv1d,
    init_dense,
)

ATTENTION_TYPES = (
    "bah", "bah_mon", "bah_norm", "luong", "luong_scaled", "location_sensitive",
)

_LOCATION_FILTERS = 20  # reference: attention.py:16-17
_LOCATION_KERNEL = 7


def init_attention(key, attention_type: str, num_units: int, memory_dim: int,
                   query_dim: int) -> Params:
    if attention_type not in ATTENTION_TYPES:
        raise ValueError(f"Unknown attention type {attention_type!r}")
    keys = jax.random.split(key, 6)
    p: Params = {
        # memory_layer / query_layer: Dense(num_units, use_bias=False)
        "memory_layer": init_dense(keys[0], memory_dim, num_units, use_bias=False),
    }
    if attention_type in ("bah", "bah_mon", "bah_norm", "location_sensitive"):
        p["query_layer"] = init_dense(keys[1], query_dim, num_units, use_bias=False)
        p["v"] = glorot_uniform(keys[2], (num_units,), num_units, 1)
    if attention_type == "bah_norm":
        # weight-normalized scoring: g * v/||v|| with inner bias b;
        # TF initializes the gain to sqrt(1/num_units)
        p["g"] = jnp.asarray((1.0 / num_units) ** 0.5)
        p["b"] = jnp.zeros((num_units,))
    if attention_type == "bah_mon":
        p["score_bias"] = jnp.zeros(())
    if attention_type == "luong_scaled":
        p["g"] = jnp.asarray(1.0)
    if attention_type == "location_sensitive":
        p["location_conv"] = init_conv1d(
            keys[3], _LOCATION_KERNEL, 1, _LOCATION_FILTERS, use_bias=False)
        p["location_layer"] = init_dense(
            keys[4], _LOCATION_FILTERS, num_units, use_bias=False)
    return p


def prepare_memory(params: Params, memory: jnp.ndarray) -> jnp.ndarray:
    """[N, T_in, memory_dim] -> projected keys [N, T_in, num_units]."""
    return dense(params["memory_layer"], memory)


def initial_alignments(attention_type: str, batch: int, t_in: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    if attention_type == "bah_mon":
        # Monotonic attention starts focused on position 0.
        return jnp.zeros((batch, t_in), dtype).at[:, 0].set(1.0)
    return jnp.zeros((batch, t_in), dtype)


def window_mask(
    prev_alignments: jnp.ndarray,   # [N, T_in]
    mask: Optional[jnp.ndarray],    # [N, T_in] or None
    back: int,
    fwd: int,
) -> jnp.ndarray:
    """Inference-time monotonic attention window: restrict the softmax
    to positions within [p-back, p+fwd] of the previously attended
    position p = argmax(prev_alignments).

    A deployment-robustness device (used by Deep Voice-era Tacotron
    servers): it forbids the mechanism from jumping backward or far
    ahead mid-utterance, bounding how badly a mis-step can derail the
    decode. Serving-only — training alignments must stay free. Opt-in
    via the ``attention_win_fwd``/``attention_win_back`` hparams."""
    p = jnp.argmax(prev_alignments, axis=-1)[:, None]
    idx = jnp.arange(prev_alignments.shape[-1])[None, :]
    win = (idx >= p - back) & (idx <= p + fwd)
    return win if mask is None else (win & mask)


def _masked_softmax(score: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    # Normalize in f32 even under the bf16 compute policy (ops/policy.py):
    # the exp/sum is a statistic, and it is a rounding-error-sized cost.
    out_dtype = score.dtype
    score = score.astype(jnp.float32)
    if mask is not None:
        score = jnp.where(mask, score, -jnp.inf)
    return jax.nn.softmax(score, axis=-1).astype(out_dtype)


def _monotonic_alignments(p_choose: jnp.ndarray, previous: jnp.ndarray) -> jnp.ndarray:
    """Raffel et al. parallel-mode monotonic attention update.

    The cumprod/cumsum recursion runs in f32 (its clipping floors sit far
    below bf16 resolution); the result returns in the compute dtype."""
    out_dtype = previous.dtype
    p_choose = p_choose.astype(jnp.float32)
    previous = previous.astype(jnp.float32)
    # exclusive cumprod of (1 - p)
    cumprod_1mp = jnp.cumprod(1.0 - p_choose, axis=-1) / jnp.clip(1.0 - p_choose, 1e-10, 1.0)
    cumprod_1mp = jnp.clip(cumprod_1mp, 1e-10, 1.0)
    out = p_choose * cumprod_1mp * jnp.cumsum(previous / cumprod_1mp, axis=-1)
    return out.astype(out_dtype)


def attention_step(
    params: Params,
    attention_type: str,
    query: jnp.ndarray,            # [N, query_dim]
    prev_alignments: jnp.ndarray,  # [N, T_in]
    keys: jnp.ndarray,             # [N, T_in, num_units]
    values: jnp.ndarray,           # [N, T_in, memory_dim]
    mask: Optional[jnp.ndarray],   # [N, T_in] or None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention read. Returns (context [N, memory_dim], alignments)."""
    if attention_type in ("luong", "luong_scaled"):
        score = jnp.einsum("nu,ntu->nt", query, keys)
        if attention_type == "luong_scaled":
            score = params["g"] * score
        alignments = _masked_softmax(score, mask)
    else:
        q = dense(params["query_layer"], query)[:, None, :]  # [N, 1, U]
        if attention_type == "location_sensitive":
            # previous alignments -> conv features -> dense, added into the
            # Bahdanau energy (reference: attention.py:40-50,53-60).
            # Measured and REJECTED on-chip: collapsing the bias-free
            # Conv1D(7,1->20) + Dense(20->U) into one [N,T,7] @ [7,U]
            # matmul over stacked shifted slices (mathematically exact,
            # effective kernel loop-invariant) made the taco2 train step
            # SLOWER, 26.6 -> 29.3 ms — the slice-stack's scan-transpose
            # is 7 pad-adds per decoder step, while XLA already fuses
            # this conv+dense pair well. See tests/test_models.py
            # (test_location_attention_matches_conv_dense) for the
            # behavioral contract either formulation must satisfy.
            f = conv1d(params["location_conv"], prev_alignments[:, :, None])
            loc = dense(params["location_layer"], f)  # [N, T_in, U]
            energy = jnp.tanh(keys + q + loc)
        elif attention_type == "bah_norm":
            v_norm = params["v"] / jnp.linalg.norm(params["v"])
            energy = jnp.tanh(keys + q + params["b"])
            score = params["g"] * jnp.einsum("u,ntu->nt", v_norm, energy)
            alignments = _masked_softmax(score, mask)
            context = jnp.einsum("nt,ntd->nd", alignments, values)
            return context, alignments
        else:
            energy = jnp.tanh(keys + q)
        score = jnp.einsum("u,ntu->nt", params["v"], energy)
        if attention_type == "bah_mon":
            score = score + params["score_bias"]
            if mask is not None:
                score = jnp.where(mask, score, -jnp.inf)
            p_choose = jax.nn.sigmoid(score)
            alignments = _monotonic_alignments(p_choose, prev_alignments)
        else:
            alignments = _masked_softmax(score, mask)

    context = jnp.einsum("nt,ntd->nd", alignments, values)
    return context, alignments
