"""Shared training-run skeleton for the CLI trainers.

Reproduces the reference step-loop contract (reference: train.py:78-130):
per-step log line with sec/step and 100-step windows, loss-explosion guard
(>100 or NaN aborts with a Slack alert), periodic metric summaries,
periodic checkpoints with artifact dumps — on top of the jitted
data-parallel step functions, with automatic latest-checkpoint resume.
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable, Iterator, Optional

import jax

from nspeech_tpu.parallel import make_mesh, shard_batch
from nspeech_tpu.train.checkpoint import CheckpointManager
from nspeech_tpu.train.loop import TrainState
from nspeech_tpu.utils import ValueWindow
from nspeech_tpu.utils.infolog import log
from nspeech_tpu.utils.metrics import MetricWriter


def pick_mesh(batch_size: int):
    """Data-parallel mesh over all devices when the batch divides evenly,
    else fall back to single-device (degenerate mesh) — loudly, because on
    a pod slice a bad batch size would otherwise silently train at 1/N
    speed."""
    n = len(jax.devices())
    if n > 1 and batch_size % n == 0:
        return make_mesh()
    if n > 1:
        log("WARNING: batch_size=%d does not divide across %d devices; "
            "FALLING BACK TO SINGLE-DEVICE training (1/%d throughput). "
            "Set batch_size to a multiple of %d to use the full mesh."
            % (batch_size, n, n, n), slack=True)
    return None


def run_training(
    log_dir: str,
    state: TrainState,
    step_fn: Callable,
    batches: Iterator,
    mesh,
    rng,
    checkpoint_interval: int = 1000,
    summary_interval: int = 1000,
    max_steps: Optional[int] = None,
    artifact_fn: Optional[Callable] = None,
    eval_fn: Optional[Callable] = None,
    restore_step: Optional[int] = None,
    max_recoveries: int = 3,
    log_interval: int = 1,
) -> TrainState:
    """Run the training loop until max_steps (or forever).

    artifact_fn(state, step, writer) is called at every checkpoint interval for
    audio/plot dumps. On a loss explosion (>100 or NaN) the run
    auto-restores from the last good checkpoint up to ``max_recoveries``
    times (the reference documented this as a manual restart procedure,
    README.md:75-80; SURVEY.md §5 calls for automating it), then aborts.

    ``log_interval`` > 1 reads the loss (a device sync) only every N-th
    step, letting the host keep N dispatches in flight between syncs —
    the same chained-dispatch discipline the bench uses. Per-step
    logging (the reference contract) stays the default; the explosion
    guard then fires at the next sync, and auto-restore from the last
    good checkpoint covers the intervening steps.
    """
    ckpt = CheckpointManager(os.path.join(log_dir, "ckpt"))
    if restore_step is not None or ckpt.latest_step() is not None:
        state = ckpt.restore(state, step=restore_step)
        log(f"Resumed from checkpoint step {int(state.step)}", slack=True)
    else:
        log("Starting new training run", slack=True)

    writer = MetricWriter(log_dir)
    time_window, loss_window = ValueWindow(100), ValueWindow(100)
    recoveries = 0

    step = int(state.step)
    try:
        for batch in batches:
            start = time.time()
            data = shard_batch(batch, mesh) if mesh is not None else batch
            step_rng = (jax.random.fold_in(rng, step)
                        if rng is not None else None)
            state, metrics = step_fn(state, data, step_rng)
            step += 1
            synced = (log_interval <= 1 or step % log_interval == 0
                      or step % summary_interval == 0
                      or step % checkpoint_interval == 0
                      or (max_steps is not None and step >= max_steps))
            if not synced:
                # keep dispatching; the device queue absorbs the steps
                time_window.append(time.time() - start)
                continue
            loss = float(metrics["loss"])  # device sync point
            assert step == int(state.step)
            time_window.append(time.time() - start)
            loss_window.append(loss)

            log("Step %-7d [%.03f sec/step, loss=%.05f, avg_loss=%.05f]" % (
                step, time_window.average, loss, loss_window.average),
                slack=(step % checkpoint_interval == 0))

            if loss > 100 or math.isnan(loss):
                log("Loss exploded to %.05f at step %d!" % (loss, step),
                    slack=True)
                if recoveries < max_recoveries and ckpt.latest_step() is not None:
                    recoveries += 1
                    state = ckpt.restore(state)
                    step = int(state.step)
                    loss_window.reset()
                    log("Auto-restored from checkpoint step %d "
                        "(recovery %d/%d)" % (step, recoveries,
                                              max_recoveries), slack=True)
                    continue
                raise RuntimeError("Loss exploded")

            if step % summary_interval == 0 and eval_fn is not None:
                # Held-out evaluation (no reference counterpart: it had
                # no dev-set signal at all) — like artifact_fn, it must
                # not kill training.
                try:
                    eval_fn(state, step, writer)
                except Exception as e:
                    log("Holdout eval failed: %s" % e)

            if step % summary_interval == 0:
                writer.scalars(step, {
                    k: float(v) for k, v in metrics.items()
                    if getattr(v, "ndim", 0) == 0})
                hists = {k: jax.device_get(v) for k, v in metrics.items()
                         if getattr(v, "ndim", 0) > 0}
                for name in ("mel_targets", "linear_targets"):
                    if hasattr(batch, name):  # reference's target histograms
                        hists[name] = jax.device_get(getattr(batch, name))
                if hists:
                    writer.histograms(step, hists)

            if step % checkpoint_interval == 0:
                log("Saving checkpoint at step %d" % step)
                ckpt.save(step, state)
                if artifact_fn is not None:
                    try:
                        artifact_fn(state, step, writer)
                    except Exception as e:  # artifacts must not kill training
                        log("Artifact dump failed: %s" % e)

            if max_steps is not None and step >= max_steps:
                log("Reached max steps (%d); saving final checkpoint" % step)
                ckpt.save(step, state)
                break
    finally:
        ckpt.wait()
        ckpt.close()
        writer.close()
    return state
