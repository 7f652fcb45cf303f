"""Jitted data-parallel train steps.

Each builder returns a single compiled step function
``(state, batch, rng) -> (state, metrics)`` with the batch sharded over the
mesh's data axis and parameters replicated; XLA GSPMD inserts the gradient
all-reduce over ICI (SURVEY.md §2.7). State buffers are donated so
parameters update in place in HBM.

This replaces the reference's sess.run train loop over graph ops
(reference: train.py:78-93).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from nspeech_tpu.config import Config
from nspeech_tpu.parallel import mesh as pmesh


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    bn_state: Any
    opt_state: Any
    # Polyak/EMA average of params, kept when cfg.ema_decay > 0 (the
    # weight-averaging trick of the Tacotron-2 and WaveNet papers);
    # None when disabled — checkpoints then carry no extra leaves.
    ema_params: Any = None


def create_state(model, optimizer, rng, ema: bool = False) -> TrainState:
    init = model.init(rng)
    if isinstance(init, tuple):
        params, bn_state = init
    else:
        params, bn_state = init, {}
    opt_state = optimizer.init(params)
    # the average starts AT the params but must not alias their buffers
    # (the jitted step donates the whole state; aliased leaves would be
    # donated twice)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema else None
    return TrainState(jnp.zeros((), jnp.int32), params, bn_state, opt_state,
                      ema_params)


def _ema_update(ema, new_params, decay: float):
    if not decay or ema is None:
        return ema
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + (1.0 - decay) * p, ema, new_params)


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def _leaf_norms(tree) -> jnp.ndarray:
    """Per-leaf gradient norms (reference parity: the TB grad-norm
    histogram, tacotron.py:171-176)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.stack(
        [jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)))) for x in leaves])


def build_tacotron_train_step(model, optimizer, mesh=None, schedule=None,
                              multi_speaker: Optional[bool] = None,
                              deferred_dw: Optional[bool] = None,
                              ema_decay: float = 0.0):
    """Train step for taco1/taco2 on a data.feeder.Batch.

    ``deferred_dw`` (default: on when the model supports it) accumulates
    the decoder scan's LSTM/projection weight gradients post-hoc from
    saved per-step activations instead of inside the scan transpose — the
    profiled ~3 ms/step accumulator-RMW lever (ops/deferred.py).
    """
    if deferred_dw is None:
        deferred_dw = hasattr(model, "deferred_zero_inputs")

    def step_fn(state: TrainState, batch, rng) -> tuple[TrainState, Dict]:
        def loss_fn(params, zs):
            outputs, new_bn = model.forward(
                params, state.bn_state, batch.inputs, batch.input_lengths,
                speaker_ids=batch.speaker_ids, mel_targets=batch.mel_targets,
                is_training=True, rng=rng, **(
                    {"deferred_zs": zs} if zs is not None else {}))
            loss, metrics = model.loss(outputs, batch.mel_targets,
                                       batch.linear_targets)
            return loss, (metrics, new_bn, outputs.get("deferred_inputs"))

        if deferred_dw:
            n, t_out = batch.mel_targets.shape[:2]
            zs0 = model.deferred_zero_inputs(
                n, t_out // model.cfg.outputs_per_step,
                t_in=batch.inputs.shape[1], t_out=t_out)
            (grads, dzs), (metrics, new_bn, cell_ins) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True)(state.params, zs0)
            grads = model.deferred_merge_grads(grads, cell_ins, dzs)
        else:
            grads, (metrics, new_bn, _) = jax.grad(
                loss_fn, has_aux=True)(state.params, None)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = _global_norm(grads)
        metrics["grad_norms"] = _leaf_norms(grads)  # per-weight, for TB hist
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        new_state = TrainState(
            state.step + 1, new_params, new_bn, new_opt,
            _ema_update(state.ema_params, new_params, ema_decay))
        return new_state, metrics

    return _jit_step(step_fn, mesh)


def build_wavenet_train_step(net, optimizer, cfg: Config, mesh=None,
                             schedule=None, use_gc: bool = False,
                             use_lc: bool = False,
                             l2_strength: Optional[float] = None,
                             ema_decay: float = 0.0):
    """Train step for WaveNet on a wavenet_feeder.WaveNetBatch."""

    def step_fn(state: TrainState, batch, rng) -> tuple[TrainState, Dict]:
        del rng  # WaveNet training is deterministic

        def loss_fn(params):
            lc = None
            if use_lc:
                # frame-rate mels + per-window phase upsample on device
                # (~hop x less host->device traffic); per-sample mels
                # pass through.
                from nspeech_tpu.ops.upsample import batch_lc

                lc = batch_lc(batch, cfg)
            logits, targets = net.forward_train(
                params, batch.audio,
                gc_ids=batch.speaker_ids if use_gc else None,
                lc=lc)
            loss, metrics = net.loss(logits, targets, params=params,
                                     l2_strength=l2_strength)
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = _global_norm(grads)
        metrics["grad_norms"] = _leaf_norms(grads)  # per-weight, for TB hist
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        new_state = TrainState(
            state.step + 1, new_params, state.bn_state, new_opt,
            _ema_update(state.ema_params, new_params, ema_decay))
        return new_state, metrics

    return _jit_step(step_fn, mesh)


def _jit_step(step_fn, mesh):
    """Jit with data-parallel shardings when a mesh is given."""
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    batch_sh = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
