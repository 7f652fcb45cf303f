"""Shared decoder machinery for the Tacotron models.

Replaces the reference's dynamic_decode / Helper object machinery
(reference: tacotron.py:79-86, neural_speech/models/utils/helpers.py) with
plain ``lax.scan``:

- teacher forcing scans over every r-th target frame, shifted right with an
  all-zero <GO> frame (TacoTrainingHelper semantics, helpers.py:41-77 —
  full padded length, no early stop);
- inference scans to ``max_iters`` feeding the last predicted frame back,
  tracking the reference's stop criterion (an output equal to the all-zero
  end token, helpers.py:32-38) to report per-row decoded lengths.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _carry_float_dtype(carry0):
    """The decode's compute dtype, read off the carry's float leaves (the
    GO frame must match or the while/scan carry flips dtype mid-loop)."""
    for leaf in jax.tree_util.tree_leaves(carry0):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            return jnp.asarray(leaf).dtype
    return jnp.float32


def teacher_frames(mel_targets: jnp.ndarray, r: int) -> jnp.ndarray:
    """[N, T_out, M] -> time-major decoder inputs [S, N, M] where S=T_out/r.

    Step s consumes the (s*r - 1)-th target frame (every r-th frame), with a
    zero GO frame first (helpers.py:49,80-82).
    """
    n, t_out, m = mel_targets.shape
    frames = mel_targets[:, r - 1::r, :]          # [N, S, M]
    go = jnp.zeros((n, 1, m), mel_targets.dtype)
    shifted = jnp.concatenate([go, frames[:, :-1, :]], axis=1)
    return jnp.moveaxis(shifted, 1, 0)


def _mix_sampled(x, prev_frame, key, sampling_ratio):
    """Per-row Bernoulli(sampling_ratio) choice between the model's own
    previous frame and the teacher frame (scheduled sampling, Bengio et
    al. 2015, arXiv:1506.03099). The fed-back frame enters under
    stop_gradient (the sampled connection is treated as an input, not a
    backprop path), which also keeps the deferred-dW restructuring exact."""
    use_model = jax.random.bernoulli(key, sampling_ratio, (x.shape[0],))
    return jnp.where(use_model[:, None], jax.lax.stop_gradient(prev_frame), x)


def scan_teacher(
    step: Callable,        # (carry, x [N,M], rng_t) -> (carry, (out [N,r*M], align [N,T_in]))
    carry0,
    inputs: jnp.ndarray,   # [S, N, M]
    rng: jnp.ndarray,
    sampling_ratio: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced decode. Returns (outputs [S, N, r*M], alignments [S, N, T_in]).

    ``sampling_ratio`` > 0 enables scheduled sampling: at each step, each
    row feeds back the model's previous predicted frame instead of the
    teacher frame with that probability (exposure-bias mitigation; 0.0 =
    pure teacher forcing, the reference's only mode, helpers.py:41-77).
    """
    s = inputs.shape[0]
    num_mels = inputs.shape[-1]
    keys = jax.random.split(rng, s)

    if sampling_ratio == 0.0:
        def body(carry, xs):
            x, key = xs
            return step(carry, x, key)

        _, (outs, aligns) = jax.lax.scan(body, carry0, (inputs, keys))
        return outs, aligns

    def body(state, xs):
        carry, prev = state
        x, key = xs
        key_mix, key_step = jax.random.split(key)
        carry, (out, align) = step(
            carry, _mix_sampled(x, prev, key_mix, sampling_ratio), key_step)
        return (carry, out[:, -num_mels:]), (out, align)

    prev0 = jnp.zeros_like(inputs[0])  # step 0's teacher input IS the GO frame
    _, (outs, aligns) = jax.lax.scan(body, (carry0, prev0), (inputs, keys))
    return outs, aligns


def scan_teacher_deferred(
    step: Callable,        # (carry, x, rng_t, zs_t) -> (carry, (out, align, aux))
    carry0,
    inputs: jnp.ndarray,   # [S, N, M]
    zs,                    # pytree of [S, ...] per-step injection tensors
    rng: jnp.ndarray,
    sampling_ratio: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Teacher-forced decode with deferred weight-gradient injections (see
    ops/deferred.py). Returns (outputs, alignments, aux) where aux stacks
    the in-scan matmul inputs [S, ...] for the post-hoc dW matmuls.
    ``sampling_ratio`` as in :func:`scan_teacher` (the stop_gradient'ed
    feedback keeps the post-hoc dW matmuls exact)."""
    s = inputs.shape[0]
    num_mels = inputs.shape[-1]
    keys = jax.random.split(rng, s)

    if sampling_ratio == 0.0:
        def body(carry, xs):
            x, key, z = xs
            return step(carry, x, key, z)

        _, (outs, aligns, aux) = jax.lax.scan(body, carry0,
                                              (inputs, keys, zs))
        return outs, aligns, aux

    def body(state, xs):
        carry, prev = state
        x, key, z = xs
        key_mix, key_step = jax.random.split(key)
        carry, (out, align, aux) = step(
            carry, _mix_sampled(x, prev, key_mix, sampling_ratio), key_step, z)
        return (carry, out[:, -num_mels:]), (out, align, aux)

    prev0 = jnp.zeros_like(inputs[0])
    _, (outs, aligns, aux) = jax.lax.scan(body, (carry0, prev0),
                                          (inputs, keys, zs))
    return outs, aligns, aux


def scan_autoregressive(
    step: Callable,
    carry0,
    batch: int,
    num_mels: int,
    r: int,
    max_iters: int,
    stop_threshold: float = 0.0,
    initial_finished: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Autoregressive decode with early stop (fixed output shapes).

    Returns (outputs [S, N, r*M], alignments [S, N, T_in], lengths [N])
    where lengths counts decoder steps until the stop token (or max_iters).
    A ``lax.while_loop`` writes into preallocated [max_iters, ...] buffers
    and terminates once every row has emitted the stop token, so a short
    utterance pays for its own steps, not for max_iters — output shapes
    stay static for jit.

    Stop criterion: a step whose every output value has |x| <=
    ``stop_threshold``. The default 0.0 reproduces the reference's
    exact-zero end-token quirk (helpers.py:35) — which a trained
    L1-regressor essentially never emits — while a small positive value
    (the ``stop_threshold`` hparam) makes early stop effective for real
    models emitting near-zero frames.

    Rows already finished (including rows of ``initial_finished``, used for
    batch-padding rows that should not keep a real utterance's decode
    alive) have their frames written as zeros, matching dynamic_decode's
    per-row zeroing of finished sequences (the cell state keeps evolving,
    like TF's impute_finished=False default).
    """
    x0 = jnp.zeros((batch, num_mels), _carry_float_dtype(carry0))  # GO frame
    if initial_finished is None:
        initial_finished = jnp.zeros((batch,), bool)

    def stopped(out):
        return jnp.all(jnp.abs(out) <= stop_threshold, axis=-1)

    # one eager step determines the per-step output shapes (and fills t=0)
    carry1, (out0, align0) = step(carry0, x0, None)
    out0 = jnp.where(initial_finished[:, None], 0.0, out0)
    outs0 = jnp.zeros((max_iters,) + out0.shape, out0.dtype).at[0].set(out0)
    aligns0 = jnp.zeros((max_iters,) + align0.shape,
                        align0.dtype).at[0].set(align0)
    stop0 = stopped(out0)
    finished0 = initial_finished | stop0
    steps0 = jnp.where(initial_finished, 0,
                       jnp.where(stop0, 1, max_iters)).astype(jnp.int32)

    def cond(state):
        t, _, _, finished, _, _, _ = state
        return (t < max_iters) & ~jnp.all(finished)

    def body(state):
        t, carry, x, finished, steps, outs, aligns = state
        carry, (out, align) = step(carry, x, None)
        # zero rows that finished at an earlier step (pre-update flag)
        out = jnp.where(finished[:, None], 0.0, out)
        outs = jax.lax.dynamic_update_index_in_dim(outs, out, t, 0)
        aligns = jax.lax.dynamic_update_index_in_dim(aligns, align, t, 0)
        now_finished = stopped(out)
        steps = jnp.where(~finished & now_finished, t + 1, steps)
        finished = finished | now_finished
        return (t + 1, carry, out[:, -num_mels:], finished, steps,
                outs, aligns)

    state = (jnp.asarray(1), carry1, out0[:, -num_mels:], finished0,
             steps0, outs0, aligns0)
    _, _, _, _, steps, outs, aligns = jax.lax.while_loop(cond, body, state)
    return outs, aligns, steps


def start_autoregressive(
    step: Callable,
    carry0,
    batch: int,
    num_mels: int,
    max_iters: int,
    stop_threshold: float = 0.0,
    initial_finished: jnp.ndarray = None,
):
    """Step 0 of the autoregressive decode, for CHUNKED (streaming) use.

    Mirrors :func:`scan_autoregressive`'s eager first step exactly and
    returns ``((out0, align0), chunk_carry)``; feed the carry to
    :func:`scan_autoregressive_chunk`. ``max_iters`` is the caller's
    total step budget (the per-row ``steps`` sentinel for rows that
    never emit a stop frame).
    """
    if initial_finished is None:
        initial_finished = jnp.zeros((batch,), bool)
    x0 = jnp.zeros((batch, num_mels), _carry_float_dtype(carry0))
    carry1, (out0, align0) = step(carry0, x0, None)
    out0 = jnp.where(initial_finished[:, None], 0.0, out0)
    stop0 = jnp.all(jnp.abs(out0) <= stop_threshold, axis=-1)
    finished0 = initial_finished | stop0
    steps0 = jnp.where(initial_finished, 0,
                       jnp.where(stop0, 1, max_iters)).astype(jnp.int32)
    chunk_carry = (jnp.asarray(1, jnp.int32), carry1,
                   out0[:, -num_mels:], finished0, steps0)
    return (out0, align0), chunk_carry


def scan_autoregressive_chunk(
    step: Callable,
    carry,
    k: int,
    num_mels: int,
    stop_threshold: float = 0.0,
):
    """Run ``k`` fixed decode steps from a :func:`start_autoregressive`
    carry; returns ``((outs [k,N,r*M], aligns [k,N,T_in]), carry)``.

    Chaining chunks reproduces :func:`scan_autoregressive`'s buffers
    bit-exactly (tested): finished rows emit zeros, and once EVERY row
    has finished a chunk emits all-zero frames and alignments — the
    untouched tail of the one-shot preallocated buffers. The caller
    stops requesting chunks when ``carry[3]`` (finished) is all-True.
    """

    def stopped(out):
        return jnp.all(jnp.abs(out) <= stop_threshold, axis=-1)

    def body(state, _):
        t, cell, x, finished, steps = state
        all_done = jnp.all(finished)  # pre-update: matches the while exit
        cell, (out, align) = step(cell, x, None)
        out = jnp.where(finished[:, None], 0.0, out)
        align = jnp.where(all_done, 0.0, align)
        now_finished = stopped(out)
        steps = jnp.where(~finished & now_finished, t + 1, steps)
        finished = finished | now_finished
        return ((t + 1, cell, out[:, -num_mels:], finished, steps),
                (out, align))

    carry, (outs, aligns) = jax.lax.scan(body, carry, None, length=k)
    return (outs, aligns), carry


def guided_attention_penalty(
    alignments: jnp.ndarray,     # [N, T_in, S]
    input_lengths: jnp.ndarray,  # [N]
    out_steps: jnp.ndarray,      # [N] voiced decoder steps per row
    sigma: float,
) -> jnp.ndarray:
    """Guided-attention penalty (Tachibana et al. 2017, arXiv:1710.08969).

    Mean over valid (input, decoder-step) cells of
    ``A[t, s] * (1 - exp(-(t/T - s/S)^2 / (2 sigma^2)))`` — attention mass
    far from the diagonal is penalized, pulling the mechanism toward the
    monotonic regime it then refines on its own. An ADDITION over the
    reference (opt-in via the ``guided_attention_weight`` hparam, default
    0.0 = reference parity); standard practice in production Tacotron
    stacks because unguided alignment can stall on low-entropy corpora.
    """
    n, t_in, s = alignments.shape
    t_norm = jnp.arange(t_in)[None, :, None] / jnp.maximum(
        input_lengths, 1)[:, None, None]
    s_norm = jnp.arange(s)[None, None, :] / jnp.maximum(
        out_steps, 1)[:, None, None]
    w = 1.0 - jnp.exp(-((t_norm - s_norm) ** 2) / (2.0 * sigma * sigma))
    valid = ((jnp.arange(t_in)[None, :, None] < input_lengths[:, None, None])
             & (jnp.arange(s)[None, None, :] < out_steps[:, None, None]))
    return (jnp.sum(alignments * w * valid)
            / jnp.maximum(jnp.sum(valid), 1))


def maybe_guided_attention(cfg, alignments, input_lengths, mel_targets,
                           is_training: bool):
    """The models' shared guided-attention gate: the penalty above when
    training with targets and ``guided_attention_weight`` > 0, else None.

    ``out_steps`` is derived from the LAST voiced frame index (not a
    voiced-frame count: interior clipped-silence frames can be exactly
    zero and must not shrink the valid decoder window)."""
    if not (is_training and mel_targets is not None
            and cfg.get("guided_attention_weight", 0.0) > 0.0):
        return None
    voiced = jnp.any(mel_targets != 0.0, axis=-1)
    t_out = mel_targets.shape[1]
    last = jnp.max(jnp.where(voiced, jnp.arange(t_out)[None, :], -1), axis=-1)
    out_steps = jnp.ceil((last + 1) / cfg.outputs_per_step).astype(jnp.int32)
    return guided_attention_penalty(
        alignments, input_lengths, out_steps,
        cfg.get("guided_attention_sigma", 0.2))


def apply_guided_loss(cfg, outputs, loss, metrics):
    """Add the weighted guided penalty (when forward() computed one) to
    ``loss`` and record it in ``metrics``; shared by both Tacotrons."""
    if "guided_attention" in outputs:
        ga = outputs["guided_attention"]
        loss = loss + cfg.guided_attention_weight * ga
        metrics["loss_guided_attention"] = ga
    return loss


def assemble_outputs(outs: jnp.ndarray, num_mels: int) -> jnp.ndarray:
    """[S, N, r*M] decoder outputs -> [N, S*r, M] mel frames."""
    s, n, rm = outs.shape
    return jnp.moveaxis(outs, 0, 1).reshape(n, s * (rm // num_mels), num_mels)


def assemble_alignments(aligns: jnp.ndarray) -> jnp.ndarray:
    """[S, N, T_in] -> [N, T_in, S] (plot orientation, tacotron.py:101)."""
    return jnp.transpose(aligns, (1, 2, 0))
