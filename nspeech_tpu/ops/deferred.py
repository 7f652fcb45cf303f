"""Deferred weight-gradient accumulation for matmuls inside ``lax.scan``.

The naive transpose of a scan whose body contains ``y = x @ W`` accumulates
``dW += x_t^T dy_t`` with a read-modify-write of the FULL [in, out] weight
gradient every backward step. For the Tacotron decoder's 4096-wide LSTM
kernels that RMW traffic (~29 MB read + write per step, 80 steps) was
profiled at ~3 ms of the 33 ms train step (README "Step-time budget").

The restructuring implemented here:

1. inside the scan, weights enter under ``stop_gradient`` (so the scan
   transpose carries NO weight-gradient accumulator), and a per-step
   zero tensor ``z`` from the scan's inputs is added to the
   pre-activation — its cotangent ``dz_t`` is exactly the full adjoint of
   the pre-activation (including every recurrent path), and the scan
   transpose emits it as a cheap per-step stacked WRITE ([B, out], no
   read) because cotangents of scan inputs are scan outputs;
2. the body also emits the matmul input ``x_t`` (a residual autodiff
   saved anyway) as a stacked output;
3. after the backward scan, ``dW = sum_t x_t^T dz_t`` is recovered as ONE
   large MXU matmul over the stacked sequences ([S*B, in]^T @ [S*B, out])
   and ``db = sum dz`` as one reduction — :func:`matmul_grads`.

This is exact (same chain rule, reassociated), verified against the
naive scan transpose in tests/test_deferred.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nspeech_tpu.ops import layers as L

Params = Dict[str, jnp.ndarray]


def dense_deferred(params: Params, x: jnp.ndarray, z: jnp.ndarray,
                   activation=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense layer with deferred weight grads.

    Returns ``(y, x)`` — the caller must emit ``x`` from the scan and pass
    the stacked ``(x, dz)`` to :func:`matmul_grads`.
    """
    y = L.acc_dot(x, lax.stop_gradient(params["kernel"])) + z
    if "bias" in params:
        y = y + lax.stop_gradient(params["bias"])
    return (activation(y) if activation is not None else y), x


def lstm_cell_deferred(
    params: Params,
    x: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray],
    z: jnp.ndarray,
    forget_bias: float = 1.0,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """LSTM cell (ops.layers.lstm_cell semantics) with deferred weight
    grads. Returns ``(out, (c, h), xh)`` where ``xh`` is the kernel input
    to stack for :func:`matmul_grads`."""
    c, h = state
    xh = jnp.concatenate([x, h], axis=-1)
    pre = (L.acc_dot(xh, lax.stop_gradient(params["kernel"]))
           + lax.stop_gradient(params["bias"]) + z)
    i, g, f, o = jnp.split(pre, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_h, (new_c, new_h), xh


def gru_cell_deferred(
    params: Params,
    x: jnp.ndarray,
    h: jnp.ndarray,
    z_gate: jnp.ndarray,
    z_cand: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GRU cell (ops.layers.gru_cell semantics) with deferred weight grads
    for BOTH kernels. Returns ``(h_new, xh, xrh)`` — the gate and
    candidate kernel inputs to stack."""
    xh = jnp.concatenate([x, h], axis=-1)
    gates = jax.nn.sigmoid(
        L.acc_dot(xh, lax.stop_gradient(params["gate_kernel"]))
        + lax.stop_gradient(params["gate_bias"]) + z_gate)
    r, u = jnp.split(gates, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    cand = jnp.tanh(
        L.acc_dot(xrh, lax.stop_gradient(params["cand_kernel"]))
        + lax.stop_gradient(params["cand_bias"]) + z_cand)
    return u * h + (1.0 - u) * cand, xh, xrh


def bilstm_wh_grads(h_entry: jnp.ndarray,
                    dz: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Post-hoc recurrent-kernel grads for the fused one-scan BiLSTM
    (ops.layers.bilstm_rnn with ``z``).

    ``h_entry`` [T, 2N, H] (entry hidden states; first N rows forward,
    last N backward) and ``dz`` [T, 2N, 4H] (stacked injection
    cotangents) -> ``(dwh_fw, dwh_bw)``, each [H, 4H], via one
    accumulating matmul per direction. These are the LAST H rows of each
    direction's [C+H, 4H] kernel; the first C rows (input projection) and
    the biases get natural gradients through the hoisted batched matmul.
    """
    t, two_n, h = h_entry.shape
    hs = h_entry.reshape(t, 2, two_n // 2, h)
    # dz arrives f32 (cotangent of the f32 injection zeros); match the
    # saved-activation dtype so the contraction stays on the MXU's native
    # path under the bf16 policy — accumulation is f32 either way.
    dzs = dz.astype(h_entry.dtype).reshape(t, 2, two_n // 2, -1)
    dwh = jnp.einsum("tgnh,tgnz->ghz", hs, dzs,
                     preferred_element_type=jnp.float32)
    return dwh[0], dwh[1]


def matmul_grads(inputs: jnp.ndarray, dz: jnp.ndarray,
                 kernel: str = "kernel", bias: str = "bias") -> Params:
    """Post-hoc weight grads from stacked scan sequences.

    ``inputs`` [S, B, in], ``dz`` [S, B, out] ->
    ``{kernel: [in, out], bias: [out]}`` via one accumulating matmul.
    """
    dW = jnp.einsum("sbi,sbo->io", inputs, dz.astype(inputs.dtype),
                    preferred_element_type=jnp.float32)
    return {kernel: dW, bias: dz.astype(jnp.float32).sum(axis=(0, 1))}
