"""Neural-net building blocks as pure functions over parameter pytrees.

Functional JAX rebuild of the reference's TF layer zoo
(reference: neural_speech/models/utils/modules.py). Every layer is a pair of
``init_*`` (returns a parameter dict) and an apply function; there is no
module object or global graph. Initializers and epsilon/momentum defaults
mirror TF 1.x so the rebuilt models start from the same distribution the
reference trained from (glorot-uniform kernels, GRU gate bias 1.0, LSTM
forget bias 1.0, batch-norm momentum 0.99 / eps 1e-3).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (TF 1.x defaults)
# ---------------------------------------------------------------------------

def glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def truncated_normal(key, shape, stddev, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    p = {"kernel": glorot_uniform(key, (in_dim, out_dim), in_dim, out_dim)}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def dense(params: Params, x: jnp.ndarray, activation=None) -> jnp.ndarray:
    y = acc_dot(x, params["kernel"])
    if "bias" in params:
        y = y + params["bias"]
    return activation(y) if activation is not None else y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def init_embedding(key, vocab_size: int, dim: int, stddev: float = 0.01) -> Params:
    return {"table": truncated_normal(key, (vocab_size, dim), stddev)}


def embedding(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


# ---------------------------------------------------------------------------
# 1-D convolution ('same' padding, NWC layout)
# ---------------------------------------------------------------------------

def init_conv1d(key, width: int, in_ch: int, out_ch: int, use_bias: bool = True) -> Params:
    fan_in = width * in_ch
    fan_out = width * out_ch
    p = {"kernel": glorot_uniform(key, (width, in_ch, out_ch), fan_in, fan_out)}
    if use_bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def conv1d(params: Params, x: jnp.ndarray, padding: str = "SAME",
           dilation: int = 1) -> jnp.ndarray:
    """x: [N, T, C] -> [N, T', C_out].

    Stays on lax.conv_general_dilated deliberately: the shifted-slice
    einsum formulation that wins 3.3x on WaveNet's narrow 32-channel
    dilated convs (models/wavenet.py:_causal_conv) was measured SLOWER
    here (taco2 step 26.1 -> 29.4 ms) — at the Tacotron stacks'
    128-512 channels the conv lowering already tiles the MXU well and
    one conv beats width-many einsums."""
    # No f32 preferred_element_type under bf16: conv's transpose rule
    # rejects the mixed-dtype cotangent the f32->bf16 convert would create,
    # and the TPU MXU accumulates bf16 convs in f32 internally anyway.
    pref = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=(1,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=pref,
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# Batch normalization (tf.layers.batch_normalization semantics:
# momentum 0.99, eps 1e-3, stats over all axes but channels)
# ---------------------------------------------------------------------------

def acc_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Matmul with f32 accumulation, result in x's dtype.

    Under the bf16 compute policy (ops/policy.py) this is the MXU's
    native bf16-multiply/f32-accumulate path with the output rounded
    back to bf16 (XLA fuses the convert); at f32 it is a plain dot.
    Keeping the output in the compute dtype is what keeps scan carries
    dtype-stable."""
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def acc_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Einsum twin of :func:`acc_dot` (f32 accumulation, a's dtype out)."""
    return jnp.einsum(spec, a, b,
                      preferred_element_type=jnp.float32).astype(a.dtype)


BN_MOMENTUM = 0.99
BN_EPS = 1e-3


def init_batch_norm(dim: int) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((dim,)), "offset": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def batch_norm(params: Params, state: Params, x: jnp.ndarray,
               is_training: bool) -> Tuple[jnp.ndarray, Params]:
    """Normalize over all leading axes. Under data-parallel jit/GSPMD the
    batch mean/var reductions are global across shards automatically
    (cross-replica batch stats — SURVEY.md §7 hard part 4)."""
    axes = tuple(range(x.ndim - 1))
    # Moments and running stats in f32 regardless of the compute dtype
    # (ops/policy.py): bf16 batch statistics drift the running estimates.
    xf = x.astype(jnp.float32)
    if is_training:
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        new_state = {
            "mean": BN_MOMENTUM * state["mean"] + (1 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * state["var"] + (1 - BN_MOMENTUM) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"].astype(jnp.float32)
    y = (xf - mean) * inv + params["offset"].astype(jnp.float32)
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Conv1d + activation + BN block (reference: modules.py:194-198 — note the
# reference order is conv(activation) then BN)
# ---------------------------------------------------------------------------

def init_conv_bn(key, width: int, in_ch: int, out_ch: int) -> Tuple[Params, Params]:
    conv_p = init_conv1d(key, width, in_ch, out_ch)
    bn_p, bn_s = init_batch_norm(out_ch)
    return {"conv": conv_p, "bn": bn_p}, {"bn": bn_s}


def conv_bn(params: Params, state: Params, x: jnp.ndarray, activation,
            is_training: bool) -> Tuple[jnp.ndarray, Params]:
    y = conv1d(params["conv"], x)
    if activation is not None:
        y = activation(y)
    y, bn_s = batch_norm(params["bn"], state["bn"], y, is_training)
    return y, {"bn": bn_s}


# ---------------------------------------------------------------------------
# Prenet: stacked dense+relu+dropout (reference: modules.py:21-27)
# ---------------------------------------------------------------------------

def init_prenet(key, in_dim: int, layer_sizes: Sequence[int]) -> Params:
    keys = jax.random.split(key, len(layer_sizes))
    layers = []
    for k, size in zip(keys, layer_sizes):
        layers.append(init_dense(k, in_dim, size))
        in_dim = size
    return {"layers": layers}


def prenet(params: Params, x: jnp.ndarray, drop_rate: float,
           rng: Optional[jnp.ndarray]) -> jnp.ndarray:
    for i, layer in enumerate(params["layers"]):
        x = dense(layer, x, jax.nn.relu)
        if drop_rate > 0.0 and rng is not None:
            key = jax.random.fold_in(rng, i)
            keep = jax.random.bernoulli(key, 1.0 - drop_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - drop_rate), 0.0)
    return x


# ---------------------------------------------------------------------------
# Highway (reference: modules.py:185-191; transform-gate bias -1)
# ---------------------------------------------------------------------------

def init_highway(key, dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    h = init_dense(k1, dim, dim)
    t = init_dense(k2, dim, dim)
    t["bias"] = jnp.full((dim,), -1.0)
    return {"H": h, "T": t}


def highway(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = dense(params["H"], x, jax.nn.relu)
    t = dense(params["T"], x, jax.nn.sigmoid)
    return h * t + x * (1.0 - t)


# ---------------------------------------------------------------------------
# Recurrent cells (TF-compatible gate math)
# ---------------------------------------------------------------------------

def init_gru(key, in_dim: int, units: int) -> Params:
    """TF GRUCell layout: gate kernel over [x, h] -> 2*units (reset, update)
    with bias 1.0; candidate kernel over [x, r*h] -> units with bias 0."""
    k1, k2 = jax.random.split(key)
    return {
        "gate_kernel": glorot_uniform(k1, (in_dim + units, 2 * units),
                                      in_dim + units, 2 * units),
        "gate_bias": jnp.ones((2 * units,)),
        "cand_kernel": glorot_uniform(k2, (in_dim + units, units),
                                      in_dim + units, units),
        "cand_bias": jnp.zeros((units,)),
    }


def gru_cell(params: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    xh = jnp.concatenate([x, h], axis=-1)
    gates = jax.nn.sigmoid(
        acc_dot(xh, params["gate_kernel"]) + params["gate_bias"])
    r, u = jnp.split(gates, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    c = jnp.tanh(acc_dot(xrh, params["cand_kernel"]) + params["cand_bias"])
    return u * h + (1.0 - u) * c


def init_lstm(key, in_dim: int, units: int) -> Params:
    """LSTMBlockCell layout: one kernel over [x, h] -> 4*units in
    (i, c', f, o) order; forget bias 1.0 added at runtime."""
    return {
        "kernel": glorot_uniform(key, (in_dim + units, 4 * units),
                                 in_dim + units, 4 * units),
        "bias": jnp.zeros((4 * units,)),
    }


def lstm_cell(params: Params, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray],
              forget_bias: float = 1.0) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    c, h = state
    xh = jnp.concatenate([x, h], axis=-1)
    z = acc_dot(xh, params["kernel"]) + params["bias"]
    i, g, f, o = jnp.split(z, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, (new_c, new_h)


# ---------------------------------------------------------------------------
# RNN scans over time with sequence-length masking
# ---------------------------------------------------------------------------

def _mask_from_lengths(lengths: Optional[jnp.ndarray], batch: int, time: int):
    if lengths is None:
        return None
    return jnp.arange(time)[None, :] < lengths[:, None]  # [N, T]


def reverse_sequence(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse the first `lengths[i]` steps of each row of [N, T, ...]."""
    T = x.shape[1]
    if lengths is None:
        return x[:, ::-1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def gru_rnn(params: Params, x: jnp.ndarray, h0: Optional[jnp.ndarray],
            lengths: Optional[jnp.ndarray], units: int) -> jnp.ndarray:
    """Unidirectional GRU over [N, T, C] -> [N, T, units] via lax.scan.
    Outputs past each row's length are zeroed and state is held (TF
    dynamic_rnn semantics)."""
    N, T = x.shape[0], x.shape[1]
    if h0 is None:
        h0 = jnp.zeros((N, units), dtype=x.dtype)
    mask = _mask_from_lengths(lengths, N, T)

    def step(h, inp):
        xt, mt = inp
        new_h = gru_cell(params, xt, h)
        if mt is not None:
            new_h = jnp.where(mt[:, None], new_h, h)
            out = jnp.where(mt[:, None], new_h, 0.0)
        else:
            out = new_h
        return new_h, out

    xs = (jnp.moveaxis(x, 1, 0), None if mask is None else jnp.moveaxis(mask, 1, 0))
    _, ys = jax.lax.scan(step, h0, xs)
    return jnp.moveaxis(ys, 0, 1)


def lstm_rnn(params: Params, x: jnp.ndarray, lengths: Optional[jnp.ndarray],
             units: int) -> jnp.ndarray:
    """Unidirectional LSTM over [N, T, C] -> [N, T, units]."""
    N, T = x.shape[0], x.shape[1]
    state0 = (jnp.zeros((N, units), x.dtype), jnp.zeros((N, units), x.dtype))
    mask = _mask_from_lengths(lengths, N, T)

    def step(state, inp):
        xt, mt = inp
        out, new_state = lstm_cell(params, xt, state)
        if mt is not None:
            new_state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(mt[:, None], n, o), new_state, state)
            out = jnp.where(mt[:, None], out, 0.0)
        return new_state, out

    xs = (jnp.moveaxis(x, 1, 0), None if mask is None else jnp.moveaxis(mask, 1, 0))
    _, ys = jax.lax.scan(step, state0, xs)
    return jnp.moveaxis(ys, 0, 1)


def bidirectional(
    fwd_fn, bwd_fn, x: jnp.ndarray, lengths: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Run fwd on x and bwd on the length-aware reversed x; concat features."""
    out_f = fwd_fn(x)
    out_b = bwd_fn(reverse_sequence(x, lengths))
    out_b = reverse_sequence(out_b, lengths)
    return jnp.concatenate([out_f, out_b], axis=-1)


# ---------------------------------------------------------------------------
# Fused bidirectional RNNs
#
# Two TPU-specific optimizations over running fwd_fn/bwd_fn separately:
# (1) the input projection x @ Wx for ALL timesteps is hoisted out of the
#     scan into one large MXU-efficient matmul, leaving only the
#     recurrent h @ Wh inside the sequential body; and
# (2) both directions run in ONE scan at 2x batch (the reversed copy is
#     stacked on the batch axis) — the scan body is latency-bound, so a
#     wider step is nearly free while the sequential step count halves.
# The per-direction recurrent weights are applied with a batched einsum
# over a leading direction axis (two independent [N, H] @ [H, 4H]).
# ---------------------------------------------------------------------------

def _stack_directions(x, lengths):
    """[N, T, C] -> [2N, T, C] with the time-reversed copy in rows N:.
    reverse_sequence keeps each row's valid steps at the front, so the
    [N, T] validity mask applies to both halves unchanged."""
    return jnp.concatenate([x, reverse_sequence(x, lengths)], axis=0)


def _unstack_directions(ys, lengths):
    """[2N, T, H] -> [N, T, 2H]: un-reverse the bwd half, concat features."""
    n = ys.shape[0] // 2
    out_b = reverse_sequence(ys[n:], lengths)
    return jnp.concatenate([ys[:n], out_b], axis=-1)


def bilstm_rnn(params_fw: Params, params_bw: Params, x: jnp.ndarray,
               lengths: Optional[jnp.ndarray], units: int,
               forget_bias: float = 1.0, z: Optional[jnp.ndarray] = None):
    """Bidirectional LSTM over [N, T, C] -> [N, T, 2*units], one scan.

    The input projection (``wx`` rows of the kernels, plus biases) is
    hoisted out of the scan as one batched matmul; only the recurrent
    ``h @ wh`` runs per step.

    ``z`` ([T, 2N, 4*units] zeros) switches on deferred weight gradients
    for the recurrent kernels (ops/deferred.py): ``wh`` enters the scan
    under ``stop_gradient`` with ``z_t`` injected into the pre-activation,
    and the entry hidden state is emitted per step, so the scan transpose
    writes stacked ``dz_t`` instead of read-modify-writing the full
    [units, 4*units] accumulators. Returns ``(out, h_entry)`` with
    ``h_entry`` [T, 2N, units]; recover the grads with
    ``deferred.bilstm_wh_grads(h_entry, dz)``.
    """
    N, T, C = x.shape
    x2 = _stack_directions(x, lengths)                       # [2N, T, C]
    # hoisted input projection, per direction (bias folded in)
    wx = jnp.stack([params_fw["kernel"][:C], params_bw["kernel"][:C]])
    wh = jnp.stack([params_fw["kernel"][C:], params_bw["kernel"][C:]])
    b = jnp.stack([params_fw["bias"], params_bw["bias"]])    # [2, 4H]
    deferred = z is not None
    if deferred:
        wh = jax.lax.stop_gradient(wh)
    xz = acc_einsum("gntc,gcz->gntz", x2.reshape(2, N, T, C),
                    wx) + b[:, None, None]
    xz = jnp.moveaxis(xz.reshape(2 * N, T, 4 * units), 1, 0)  # [T, 2N, 4H]
    mask = _mask_from_lengths(lengths, N, T)
    mask2 = None if mask is None else jnp.moveaxis(
        jnp.concatenate([mask, mask], axis=0), 1, 0)          # [T, 2N]

    def step(state, inp):
        zt, mt, inj = inp
        c, h = state
        hz = acc_einsum("gnh,ghz->gnz", h.reshape(2, N, units), wh)
        pre = zt + hz.reshape(2 * N, 4 * units)
        if inj is not None:
            pre = pre + inj
        i, g, f, o = jnp.split(pre, 4, axis=-1)
        new_c = (jax.nn.sigmoid(f + forget_bias) * c
                 + jax.nn.sigmoid(i) * jnp.tanh(g))
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        out = new_h
        if mt is not None:
            new_c = jnp.where(mt[:, None], new_c, c)
            new_h = jnp.where(mt[:, None], new_h, h)
            out = jnp.where(mt[:, None], out, 0.0)
        ys = (out, h) if inj is not None else out
        return (new_c, new_h), ys

    state0 = (jnp.zeros((2 * N, units), x.dtype),
              jnp.zeros((2 * N, units), x.dtype))
    _, ys = jax.lax.scan(step, state0, (xz, mask2, z))
    if deferred:
        ys, h_entry = ys
        return _unstack_directions(jnp.moveaxis(ys, 0, 1), lengths), h_entry
    return _unstack_directions(jnp.moveaxis(ys, 0, 1), lengths)


def bigru_rnn(params_fw: Params, params_bw: Params, x: jnp.ndarray,
              h0: Optional[jnp.ndarray], lengths: Optional[jnp.ndarray],
              units: int) -> jnp.ndarray:
    """Bidirectional GRU over [N, T, C] -> [N, T, 2*units], one scan.
    ``h0`` (e.g. a speaker-conditioned initial state) seeds BOTH
    directions, matching the separate-scan semantics."""
    N, T, C = x.shape
    x2 = _stack_directions(x, lengths)
    gx = jnp.stack([params_fw["gate_kernel"][:C], params_bw["gate_kernel"][:C]])
    gh = jnp.stack([params_fw["gate_kernel"][C:], params_bw["gate_kernel"][C:]])
    gb = jnp.stack([params_fw["gate_bias"], params_bw["gate_bias"]])
    cx = jnp.stack([params_fw["cand_kernel"][:C], params_bw["cand_kernel"][:C]])
    ch = jnp.stack([params_fw["cand_kernel"][C:], params_bw["cand_kernel"][C:]])
    cb = jnp.stack([params_fw["cand_bias"], params_bw["cand_bias"]])
    x4 = x2.reshape(2, N, T, C)
    xg = (acc_einsum("gntc,gcz->gntz", x4, gx)
          + gb[:, None, None]).reshape(2 * N, T, 2 * units)
    xc = (acc_einsum("gntc,gcz->gntz", x4, cx)
          + cb[:, None, None]).reshape(2 * N, T, units)
    xg = jnp.moveaxis(xg, 1, 0)
    xc = jnp.moveaxis(xc, 1, 0)
    mask = _mask_from_lengths(lengths, N, T)
    mask2 = None if mask is None else jnp.moveaxis(
        jnp.concatenate([mask, mask], axis=0), 1, 0)

    def step(h, inp):
        xgt, xct, mt = inp
        gates = jax.nn.sigmoid(
            xgt + acc_einsum("gnh,ghz->gnz", h.reshape(2, N, units),
                             gh).reshape(2 * N, 2 * units))
        r, u = jnp.split(gates, 2, axis=-1)
        c = jnp.tanh(
            xct + acc_einsum("gnh,ghz->gnz", (r * h).reshape(2, N, units),
                             ch).reshape(2 * N, units))
        new_h = u * h + (1.0 - u) * c
        out = new_h
        if mt is not None:
            new_h = jnp.where(mt[:, None], new_h, h)
            out = jnp.where(mt[:, None], out, 0.0)
        return new_h, out

    if h0 is None:
        h0_2 = jnp.zeros((2 * N, units), x.dtype)
    else:
        h0_2 = jnp.concatenate([h0, h0], axis=0)
    _, ys = jax.lax.scan(step, h0_2, (xg, xc, mask2))
    return _unstack_directions(jnp.moveaxis(ys, 0, 1), lengths)
