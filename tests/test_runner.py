"""Training-runner control logic with a stub step function: max-steps stop,
checkpoint cadence + auto-resume, loss-explosion abort (SURVEY.md §5
failure-detection contract)."""

import itertools
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.train.loop import TrainState
from nspeech_tpu.train.runner import run_training


pytestmark = pytest.mark.smoke  # fast contract tests



def make_state(step=0):
    return TrainState(jnp.asarray(step, jnp.int32),
                      {"w": jnp.ones((2, 2))}, {}, {"m": jnp.zeros((2, 2))})


def stub_step(losses):
    it = iter(losses)

    def step_fn(state, batch, rng):
        loss = next(it)
        return TrainState(state.step + 1, state.params, state.bn_state,
                          state.opt_state), {"loss": jnp.asarray(loss)}

    return step_fn


def batches():
    while True:
        yield {"x": np.zeros(2)}


def test_max_steps_and_checkpoints(tmp_path):
    log_dir = str(tmp_path / "run")
    state = run_training(
        log_dir, make_state(), stub_step([1.0, 0.9, 0.8, 0.7, 0.6]),
        batches(), mesh=None, rng=None,
        checkpoint_interval=2, summary_interval=1, max_steps=4)
    assert int(state.step) == 4
    from nspeech_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(log_dir, "ckpt"))
    assert mgr.latest_step() == 4
    mgr.close()
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))


def test_auto_resume(tmp_path):
    log_dir = str(tmp_path / "run")
    run_training(log_dir, make_state(), stub_step([1.0, 0.9]), batches(),
                 mesh=None, rng=None, checkpoint_interval=10, max_steps=2)
    # Second invocation must resume from step 2, not restart.
    state = run_training(log_dir, make_state(), stub_step([0.8, 0.7]),
                         batches(), mesh=None, rng=None,
                         checkpoint_interval=10, max_steps=4)
    assert int(state.step) == 4


def test_loss_explosion_aborts(tmp_path):
    log_dir = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="exploded"):
        run_training(log_dir, make_state(), stub_step([1.0, 500.0]),
                     batches(), mesh=None, rng=None, max_steps=10)


def test_loss_explosion_auto_recovers_from_checkpoint(tmp_path):
    """After a checkpoint exists, an explosion restores it and continues
    (SURVEY.md §5: automated version of the reference's manual restart)."""
    log_dir = str(tmp_path / "run")
    # checkpoint at step 2; explode at step 3; recover (back to step 2);
    # then finish steps 3 and 4 cleanly.
    state = run_training(
        log_dir, make_state(), stub_step([1.0, 0.9, 500.0, 0.8, 0.7, 0.6]),
        batches(), mesh=None, rng=None,
        checkpoint_interval=2, max_steps=4, max_recoveries=2)
    assert int(state.step) == 4


def test_explosion_before_any_checkpoint_aborts(tmp_path):
    log_dir = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="exploded"):
        run_training(log_dir, make_state(), stub_step([500.0]),
                     batches(), mesh=None, rng=None,
                     checkpoint_interval=10, max_steps=5, max_recoveries=3)


def test_nan_loss_aborts(tmp_path):
    log_dir = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="exploded"):
        run_training(log_dir, make_state(), stub_step([float("nan")]),
                     batches(), mesh=None, rng=None, max_steps=10)


def test_value_window():
    from nspeech_tpu.utils import ValueWindow

    w = ValueWindow(size=3)
    assert w.average == 0.0 and w.count == 0
    for v in (1.0, 2.0, 3.0):
        w.append(v)
    assert w.average == 2.0 and w.sum == 6.0
    w.append(10.0)  # evicts 1.0 -> window is [2, 3, 10]
    assert w.count == 3 and w.average == 5.0
    w.reset()
    assert w.count == 0 and w.average == 0.0


@pytest.mark.smoke
def test_trace_summary_aggregates_ops(tmp_path):
    """summarize_trace reads a profiler-layout trace and aggregates device
    op durations, dropping python-level rows."""
    import gzip
    import json

    from nspeech_tpu.utils.profiling import summarize_trace

    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    events = [
        {"ph": "X", "name": "while.1", "dur": 1500, "ts": 0},
        {"ph": "X", "name": "while.1", "dur": 500, "ts": 2},
        {"ph": "X", "name": "fusion.9", "dur": 300, "ts": 4},
        {"ph": "X", "name": "$prof.py:1 trace", "dur": 9999, "ts": 5},
        {"ph": "M", "name": "process_name"},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    rows = summarize_trace(str(tmp_path))
    assert rows[0] == (2.0, 2, "while.1")
    assert rows[1] == (0.3, 1, "fusion.9")
    assert all("$" not in name for _, _, name in rows)


def test_pick_mesh_fallback_is_loud(capsys):
    """An indivisible batch size falls back to single-device training with
    a WARNING (not silently at 1/N speed)."""
    import jax

    from nspeech_tpu.train.runner import pick_mesh

    n = len(jax.devices())
    assert n > 1  # conftest forces an 8-device CPU host
    assert pick_mesh(n * 2) is not None
    capsys.readouterr()
    assert pick_mesh(n * 2 + 1) is None
    out = capsys.readouterr().out
    assert "FALLING BACK TO SINGLE-DEVICE" in out
    assert "batch_size=%d" % (n * 2 + 1) in out


def test_log_interval_syncs_sparsely(tmp_path, capsys):
    """log_interval=3: the loss is read (and logged) only at sync steps,
    max_steps still stops exactly, and an explosion surfaces at the NEXT
    sync instead of being missed."""
    log_dir = str(tmp_path / "run")
    state = run_training(
        log_dir, make_state(), stub_step([1.0] * 7), batches(),
        mesh=None, rng=None, checkpoint_interval=100, summary_interval=100,
        max_steps=7, log_interval=3)
    assert int(state.step) == 7
    out = capsys.readouterr().out
    for step, expect in ((1, False), (2, False), (3, True), (6, True),
                         (7, True)):
        assert ("Step %-7d" % step in out) == expect, (step, out)

    # an explosion at an unsynced step is caught at the next sync (in a
    # real model the NaN propagates through the params, so later losses
    # are NaN too — the stub mirrors that)
    nan = float("nan")
    with pytest.raises(RuntimeError, match="xploded"):
        run_training(
            str(tmp_path / "run2"), make_state(),
            stub_step([1.0, nan, nan, nan, nan, nan]), batches(),
            mesh=None, rng=None, checkpoint_interval=100,
            summary_interval=100, max_steps=6, log_interval=3)
