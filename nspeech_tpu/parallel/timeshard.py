"""Sequence parallelism for WaveNet: shard the sample axis across the mesh.

The reference bounds long audio by host-side chunking with receptive-field
overlap (reference: WavenetDataFeeder.py:121-128). Here the same math runs
ON DEVICE across the mesh: each device holds a contiguous time chunk and
receives its left halo (``receptive_field`` samples) from its neighbor via
``lax.ppermute`` — the causal-convolution analogue of ring attention
(SURVEY.md §5 long-context plan). The non-circular permutation leaves the
first shard's halo at zero, which is exactly the reference feeder's
left-zero-padding convention, so the sharded computation equals the
unsharded zero-padded one bit-for-bit (tests/test_timeshard.py).

Gradients flow through the halo exchange (ppermute transposes to the
reverse permutation), so this builds a full training step for audio windows
far longer than one device could hold.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nspeech_tpu.parallel.mesh import DATA_AXIS


def _left_halo(x: jnp.ndarray, halo: int, axis_name: str, n: int) -> jnp.ndarray:
    """Each shard receives the last ``halo`` steps (axis 1) of its left
    neighbor; shard 0 receives zeros (no source)."""
    perm = [(k, k + 1) for k in range(n - 1)]
    return jax.lax.ppermute(x[:, -halo:], axis_name, perm)


def make_time_sharded_logits(net, mesh: Mesh, axis: str = DATA_AXIS,
                             use_gc: bool = False, use_lc: bool = False):
    """Returns fn(params, audio [B, T], gc_ids, lc [B, T, M]) ->
    (logits [B, T, Q], targets [B, T]) with T sharded over ``axis``.

    T must be divisible by the axis size, and T/n must be >= the receptive
    field (single-hop halo).
    """
    n = mesh.shape[axis]
    rf = net.receptive_field

    def local_fn(params, audio_loc, gc_ids, lc_loc):
        halo = _left_halo(audio_loc, rf, axis, n)
        window = jnp.concatenate([halo, audio_loc], axis=1)
        lc_window = None
        if use_lc:
            lc_halo = _left_halo(lc_loc, rf, axis, n)
            lc_window = jnp.concatenate([lc_halo, lc_loc], axis=1)
        logits, targets = net.forward_train(
            params, window,
            gc_ids=gc_ids if use_gc else None,
            lc=lc_window)
        return logits, targets

    def fn(params, audio, gc_ids=None, lc=None):
        T = audio.shape[1]
        if T % n != 0:
            raise ValueError(f"time length {T} not divisible by {n} shards")
        if T // n < rf:
            raise ValueError(
                f"chunk {T // n} < receptive field {rf}: single-hop halo "
                "needs chunks at least as long as the receptive field")
        if gc_ids is None:
            gc_ids = jnp.zeros((audio.shape[0],), jnp.int32)
        if lc is None:
            lc = jnp.zeros((audio.shape[0], T, max(net.lc_channels, 1)),
                           jnp.float32)
        sharded = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(None, axis), P(), P(None, axis, None)),
            out_specs=(P(None, axis, None), P(None, axis)),
        )
        return sharded(params, audio, gc_ids, lc)

    return fn


def build_time_sharded_wavenet_step(net, optimizer, mesh: Mesh,
                                    axis: str = DATA_AXIS,
                                    use_gc: bool = False, use_lc: bool = False,
                                    schedule=None, cfg=None,
                                    ema_decay: float = 0.0):
    """Jitted train step on time-sharded long audio windows.

    state/batch contract matches train.loop.build_wavenet_train_step but the
    batch's audio (and lc) time axis is sharded over the mesh instead of the
    batch axis. Batches in the feeder's frame-rate lc layout (``mel_phase``
    set) are upsampled to per-sample rate on device before sharding —
    pass ``cfg`` (for the hop length) when using that layout.
    """
    from nspeech_tpu.ops.upsample import batch_lc
    from nspeech_tpu.train.loop import TrainState, _ema_update, _global_norm

    logits_fn = make_time_sharded_logits(net, mesh, axis, use_gc, use_lc)
    repl = NamedSharding(mesh, P())
    time_sh = NamedSharding(mesh, P(None, axis))
    time_sh3 = NamedSharding(mesh, P(None, axis, None))

    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        del rng

        def loss_fn(params):
            logits, targets = logits_fn(
                params, batch.audio,
                gc_ids=batch.speaker_ids if use_gc else None,
                lc=batch_lc(batch, cfg) if use_lc else None)
            return net.loss(logits, targets)

        (loss_val), grads = jax.value_and_grad(
            lambda p: loss_fn(p)[0])(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss_val, "grad_norm": _global_norm(grads)}
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        return TrainState(state.step + 1, new_params, state.bn_state,
                          new_opt,
                          _ema_update(state.ema_params, new_params,
                                      ema_decay)), metrics

    return jax.jit(step_fn, donate_argnums=(0,))
