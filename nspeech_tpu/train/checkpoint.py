"""Orbax checkpointing with the reference's retention policy.

Replaces tf.train.Saver(max_to_keep=5, keep_checkpoint_every_n_hours=2)
and the manual --restore-step flow (reference: train.py:60-71) with async
Orbax saves, automatic latest-step resume, and explicit step restore.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from nspeech_tpu.train.loop import TrainState


def _as_tree(state: TrainState) -> dict:
    """TrainState -> checkpointable dict. A disabled (None) ema_params
    field is dropped so EMA-off checkpoints keep the exact pre-EMA
    layout — old checkpoints restore unchanged, and TrainState's field
    default fills the gap on load."""
    d = state._asdict()
    if d.get("ema_params") is None:
        del d["ema_params"]
    return d


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 keep_period_hours: float = 2.0):
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_time_interval=__import__("datetime").timedelta(
                hours=keep_period_hours),
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(os.path.abspath(directory), options=options)

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_as_tree(state)))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None,
                sharding=None) -> TrainState:
        """Restore into the structure of ``state_like`` (an initialized or
        eval_shape'd TrainState provides the tree/shape template).

        Target shardings are forced to ``sharding`` (default: replicated on
        the current default device), so checkpoints restore cleanly across
        topologies — e.g. TPU-trained weights into a CPU eval process.
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("No checkpoint found")
        if sharding is None:
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def to_template(x):
            sds = ocp.utils.to_shape_dtype_struct(x)
            return jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=sharding)

        template = jax.tree_util.tree_map(to_template, _as_tree(state_like))
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except ValueError:
            # ema_decay toggled between save and restore: the on-disk tree
            # and the template differ only by the optional ema_params
            # subtree (same leaves as params). Retry with the other
            # layout, then honor the CALLER's intent below; any unrelated
            # structure mismatch fails again here and surfaces.
            alt = dict(template)
            if "ema_params" in alt:
                del alt["ema_params"]
            else:
                alt["ema_params"] = template["params"]
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(alt))
            if "ema_params" in template:
                # EMA newly enabled: seed the average at the restored params
                restored["ema_params"] = jax.tree_util.tree_map(
                    jnp.copy, restored["params"])
            else:
                # EMA disabled by the caller: drop the checkpoint's average
                restored.pop("ema_params", None)
        return TrainState(**restored)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def load_serving_params(checkpoint_dir: str, model, cfg, model_name: str,
                        step: Optional[int] = None):
    """Restore ``(params, bn_state)`` for inference — the ONE place that
    encodes the serving restore policy: the TrainState template is built
    from the model/config (including the EMA field when
    ``cfg.ema_decay > 0``, which travels in run metadata), and the
    Polyak-averaged weights are preferred when the checkpoint carries
    them (the eval-time weights of the Tacotron-2/WaveNet papers).
    Used by Synthesizer, WaveNetVocoder and generate_wavenet."""
    from nspeech_tpu.train.loop import create_state
    from nspeech_tpu.train.optim import make_optimizer

    tx, _ = make_optimizer(cfg, model_name)
    ema = bool(float(getattr(cfg, "ema_decay", 0.0)))
    template = jax.eval_shape(
        lambda: create_state(model, tx, jax.random.PRNGKey(0), ema=ema))
    mgr = CheckpointManager(checkpoint_dir)
    state = mgr.restore(template, step=step)
    mgr.close()
    params = (state.ema_params if state.ema_params is not None
              else state.params)
    return params, state.bn_state
