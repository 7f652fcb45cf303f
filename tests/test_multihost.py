"""Multi-host DCN path (VERDICT r1 item 8): two real OS processes, each
with 2 virtual CPU devices, joined by jax.distributed.initialize over a
127.0.0.1 coordinator, running one data-parallel WaveNet step with
per-host feeder shards. This is the fake-device strategy of SURVEY.md
§4.4 extended across the process (DCN) boundary."""

import os
import socket
import subprocess
import sys

import pytest

from tests.make_synth_corpus import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    # bounded by the communicate(timeout=400) below
    corpus = make_corpus(str(tmp_path / "corpus"), n=4)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), "2", str(port), str(corpus)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=400)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        losses.append(float(lines[-1].split()[1]))
    # identical loss on both hosts == the psum really spanned processes
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
