"""Composite encoder/postnet blocks: CBHG, conv+BiLSTM, postnet.

Functional rebuild of the reference composites
(reference: neural_speech/models/utils/modules.py:30-58,109-182). Reference
quirks are preserved deliberately where they define trained behavior
(SURVEY.md §2.3 notes): the CBHG max-pool output is discarded (projections
read the conv bank directly), intermediate projection layers also read the
bank, the highway bottleneck is hardcoded to 128 channels, and per-highway
speaker-embedding concatenation doubles the feature width each layer.

Each composite returns (params, bn_state) from init and (output, new_state)
from apply; batch-norm running statistics are the only mutable state.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nspeech_tpu.ops import layers as L

softsign = jax.nn.soft_sign


# ---------------------------------------------------------------------------
# CBHG (reference: modules.py:133-182)
# ---------------------------------------------------------------------------

def init_cbhg(
    key,
    in_dim: int,
    K: int,
    proj_sizes: Sequence[int],
    gru_units: int = 128,
    num_highways: int = 4,
    bank_channels: int = 128,
    speaker_dim: Optional[int] = None,
):
    keys = iter(jax.random.split(key, K + len(proj_sizes) + num_highways * 2 + 8))
    params, state = {}, {}

    # Conv bank: widths 1..K, each bank_channels out (reference hardcodes 128).
    bank_p, bank_s = [], []
    for k in range(1, K + 1):
        p, s = L.init_conv_bn(next(keys), k, in_dim, bank_channels)
        bank_p.append(p)
        bank_s.append(s)
    params["bank"], state["bank"] = bank_p, bank_s

    # Projections (width 3). Reference dataflow (modules.py:142-144): every
    # non-final projection reads the conv bank; only the final one chains.
    bank_out = bank_channels * K
    n_proj = len(proj_sizes)
    proj_p, proj_s = [], []
    for i, size in enumerate(proj_sizes):
        if i < n_proj - 1 or n_proj == 1:
            in_ch = bank_out
        else:
            in_ch = proj_sizes[n_proj - 2]
        p, s = L.init_conv_bn(next(keys), 3, in_ch, size)
        proj_p.append(p)
        proj_s.append(s)
    params["proj"], state["proj"] = proj_p, proj_s

    # Residual add with inputs requires proj_sizes[-1] == in_dim; then a
    # bottleneck dense to 128 when in_dim != 128 (modules.py:149-151).
    highway_dim = 128
    if in_dim != highway_dim:
        params["bottleneck"] = L.init_dense(next(keys), in_dim, highway_dim)

    # Highway stack; with speaker conditioning the width doubles each layer
    # (reference quirk, modules.py:156-162).
    hw_p = []
    dim = highway_dim
    for _ in range(num_highways):
        layer = {}
        if speaker_dim is not None:
            layer["spk"] = L.init_dense(next(keys), speaker_dim, dim)
            dim = dim * 2
        layer["hw"] = L.init_highway(next(keys), dim)
        hw_p.append(layer)
    params["highways"] = hw_p

    # Bidirectional GRU (optionally speaker-initialized, modules.py:164-179).
    params["gru_fw"] = L.init_gru(next(keys), dim, gru_units)
    params["gru_bw"] = L.init_gru(next(keys), dim, gru_units)
    if speaker_dim is not None:
        params["spk_gru"] = L.init_dense(next(keys), speaker_dim, gru_units)

    meta = {"K": K, "gru_units": gru_units, "in_dim": in_dim}
    return params, state, meta


def cbhg(
    params,
    state,
    meta,
    x: jnp.ndarray,                      # [N, T, in_dim]
    lengths: Optional[jnp.ndarray],
    speaker_embd: Optional[jnp.ndarray],
    is_training: bool,
) -> Tuple[jnp.ndarray, dict]:
    new_state = {"bank": [], "proj": []}

    bank_outs = []
    for p, s in zip(params["bank"], state["bank"]):
        y, ns = L.conv_bn(p, s, x, jax.nn.relu, is_training)
        bank_outs.append(y)
        new_state["bank"].append(ns)
    conv_bank = jnp.concatenate(bank_outs, axis=-1)

    # (Max-pool is computed and discarded in the reference, modules.py:139;
    # we skip computing it.)

    n_proj = len(params["proj"])
    conv_proj = conv_bank
    for i, (p, s) in enumerate(zip(params["proj"], state["proj"])):
        src = conv_bank if (i < n_proj - 1 or n_proj == 1) else conv_proj
        act = jax.nn.relu if i < n_proj - 1 else None
        conv_proj, ns = L.conv_bn(p, s, src, act, is_training)
        new_state["proj"].append(ns)

    highway_input = conv_proj + x
    if "bottleneck" in params:
        highway_input = L.dense(params["bottleneck"], highway_input)

    h = highway_input
    for layer in params["highways"]:
        if speaker_embd is not None and "spk" in layer:
            s = L.dense(layer["spk"], speaker_embd, softsign)  # [N, dim]
            s = jnp.broadcast_to(s[:, None, :], h.shape[:2] + s.shape[-1:])
            h = jnp.concatenate([h, s], axis=-1)
        h = L.highway(layer["hw"], h)

    gru_units = meta["gru_units"]
    h0 = None
    if speaker_embd is not None and "spk_gru" in params:
        h0 = L.dense(params["spk_gru"], speaker_embd, softsign)

    out = L.bigru_rnn(params["gru_fw"], params["gru_bw"], h, h0, lengths,
                      gru_units)
    return out, new_state


# ---------------------------------------------------------------------------
# conv_and_lstm (reference: modules.py:30-49) — Tacotron-2 encoder / expand
# ---------------------------------------------------------------------------

def init_conv_and_lstm(key, in_dim: int, conv_layers: int, conv_width: int,
                       conv_channels: int, lstm_units: int):
    keys = jax.random.split(key, conv_layers + 2)
    conv_p, conv_s = [], []
    ch = in_dim
    for i in range(conv_layers):
        p, s = L.init_conv_bn(keys[i], conv_width, ch, conv_channels)
        conv_p.append(p)
        conv_s.append(s)
        ch = conv_channels
    params = {
        "convs": conv_p,
        "lstm_fw": L.init_lstm(keys[-2], ch, lstm_units),
        "lstm_bw": L.init_lstm(keys[-1], ch, lstm_units),
    }
    return params, {"convs": conv_s}, {"lstm_units": lstm_units}


def conv_and_lstm(params, state, meta, x, lengths, is_training: bool,
                  z=None):
    """``z`` ([T, 2N, 4*units] zeros) enables deferred recurrent-kernel
    gradients in the BiLSTM (ops/deferred.py); the return gains a third
    element, the stacked entry hidden states for ``bilstm_wh_grads``."""
    new_conv_s = []
    n = len(params["convs"])
    for i, (p, s) in enumerate(zip(params["convs"], state["convs"])):
        act = jax.nn.relu if i < n - 1 else None
        x, ns = L.conv_bn(p, s, x, act, is_training)
        new_conv_s.append(ns)
    units = meta["lstm_units"]
    if z is not None:
        out, h_entry = L.bilstm_rnn(params["lstm_fw"], params["lstm_bw"],
                                    x, lengths, units, z=z)
        return out, {"convs": new_conv_s}, h_entry
    out = L.bilstm_rnn(params["lstm_fw"], params["lstm_bw"], x, lengths,
                       units)
    return out, {"convs": new_conv_s}


# ---------------------------------------------------------------------------
# Postnet (reference: modules.py:52-58)
# ---------------------------------------------------------------------------

def init_postnet(key, in_dim: int, conv_layers: int, conv_width: int,
                 channels: int):
    keys = jax.random.split(key, conv_layers + 1)
    conv_p, conv_s = [], []
    ch = in_dim
    for i in range(conv_layers):
        p, s = L.init_conv_bn(keys[i], conv_width, ch, channels)
        conv_p.append(p)
        conv_s.append(s)
        ch = channels
    params = {"convs": conv_p, "out": L.init_dense(keys[-1], ch, in_dim)}
    return params, {"convs": conv_s}


def postnet(params, state, x, is_training: bool):
    new_conv_s = []
    n = len(params["convs"])
    y = x
    for i, (p, s) in enumerate(zip(params["convs"], state["convs"])):
        act = jnp.tanh if i < n - 1 else None
        y, ns = L.conv_bn(p, s, y, act, is_training)
        new_conv_s.append(ns)
    return L.dense(params["out"], y), {"convs": new_conv_s}
