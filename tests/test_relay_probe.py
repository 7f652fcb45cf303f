"""Relay liveness probes (nspeech_tpu.utils.relay).

The driver's bench/dryrun records were voided in past rounds by two
distinct relay failure modes: port REFUSES (daemon dead) and port
ACCEPTS while the tunnel behind the daemon is gone (half-dead — backend
init blocks forever with no error). These tests pin the probe for each:
``port_refuses`` for the first, the watchdog ``device_init_blocks`` for
the second.
"""

import socket
import threading
import time

import pytest

from nspeech_tpu.utils import relay


@pytest.mark.smoke
def test_port_refuses_on_closed_port():
    # Bind-then-close guarantees an unused port number.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    assert relay.port_refuses("127.0.0.1", port, timeout=1.0) is True


@pytest.mark.smoke
def test_port_refuses_false_on_listening_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    try:
        port = s.getsockname()[1]
        assert relay.port_refuses("127.0.0.1", port, timeout=1.0) is False
    finally:
        s.close()


@pytest.mark.smoke
def test_device_init_blocks_false_when_backend_live(monkeypatch):
    # Under the test env the CPU backend initializes instantly; the
    # watchdog must report "no hang" well inside the budget.
    t0 = time.monotonic()
    assert relay.device_init_blocks(timeout_s=120.0) is False
    assert time.monotonic() - t0 < 60.0


@pytest.mark.smoke
def test_device_exec_blocks_false_when_backend_live():
    # On the CPU test backend a tiny dispatch completes immediately; the
    # exec-level watchdog must agree the backend is live.
    t0 = time.monotonic()
    assert relay.device_exec_blocks(timeout_s=120.0) is False
    assert time.monotonic() - t0 < 60.0


@pytest.mark.smoke
def test_device_exec_blocks_true_on_hang(monkeypatch):
    # Simulate the half-dead tunnel state this probe exists for: device
    # listing succeeds but the first real dispatch never completes
    # (observed live 2026-08-20 — devices() 0.2s, matmul 221s..forever).
    import sys

    class _HangingJnp:
        float32 = "float32"  # attribute access must not raise pre-call

        def ones(self, *a, **k):
            threading.Event().wait(30)  # far past the watchdog budget

    class _LiveJax:
        numpy = _HangingJnp()  # `import jax.numpy as jnp` binds via getattr

        def devices(self):
            return ["fake-device"]

    monkeypatch.setitem(sys.modules, "jax", _LiveJax())
    monkeypatch.setitem(sys.modules, "jax.numpy", _LiveJax.numpy)
    t0 = time.monotonic()
    assert relay.device_exec_blocks(timeout_s=0.5) is True
    assert time.monotonic() - t0 < 5.0


@pytest.mark.smoke
def test_exec_probe_subprocess_returns_dispatch_time():
    # Fresh child on the CPU backend: the probe must report a measured
    # dispatch time well under the watchdog.
    res = relay.exec_probe_subprocess(timeout_s=120.0, platform="cpu")
    assert res.ok and res.status == "ok"
    assert 0.0 <= res.seconds < 60.0


@pytest.mark.smoke
def test_exec_probe_subprocess_timeout_on_hang(monkeypatch):
    # A child that never completes must be killed at the watchdog and
    # reported as a TIMEOUT (not an error) without wedging the caller.
    monkeypatch.setattr(relay, "_PROBE_SNIPPET",
                        "import time\ntime.sleep(30)\n")
    t0 = time.monotonic()
    res = relay.exec_probe_subprocess(timeout_s=1.0)
    assert not res.ok and res.status == "timeout" and res.seconds is None
    assert time.monotonic() - t0 < 10.0


@pytest.mark.smoke
def test_exec_probe_subprocess_error_carries_stderr(monkeypatch):
    # An erroring child is a DIFFERENT diagnosis than a hang: the result
    # must say 'error' and carry the child's actual traceback tail so the
    # failure is diagnosable from the bench/driver log.
    monkeypatch.setattr(relay, "_PROBE_SNIPPET",
                        "raise RuntimeError('backend broken')\n")
    res = relay.exec_probe_subprocess(timeout_s=30.0)
    assert not res.ok and res.status == "error"
    assert "backend broken" in res.detail


@pytest.mark.smoke
def test_probe_ok_marker_roundtrip(tmp_path, monkeypatch):
    # A successful real-backend probe records a marker; recent_probe_ok
    # honors it within the age budget and rejects a stale one.
    marker = tmp_path / "probe_ok"
    monkeypatch.setattr(relay, "_PROBE_MARKER", str(marker))
    assert relay.recent_probe_ok() is False
    relay.mark_probe_ok()
    assert relay.recent_probe_ok() is True
    import os
    old = time.time() - 3600
    os.utime(marker, (old, old))
    assert relay.recent_probe_ok(max_age_s=600.0) is False


@pytest.mark.smoke
def test_entry_cpu_fallback_wiring(monkeypatch):
    # entry()'s guard must repin a wedged testbed to the CPU backend
    # (here already CPU, so the repin is a no-op) without raising, and
    # must not probe at all off the testbed.
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    calls = []
    monkeypatch.setattr(relay, "on_axon_testbed", lambda: True)
    monkeypatch.setattr(relay, "relay_dead", lambda: True)
    g._cpu_fallback_if_tunnel_wedged()
    import jax
    assert jax.default_backend() == "cpu"

    monkeypatch.setattr(relay, "on_axon_testbed", lambda: False)
    monkeypatch.setattr(relay, "exec_probe_subprocess",
                        lambda *a, **k: calls.append(1))
    g._cpu_fallback_if_tunnel_wedged()
    assert not calls  # off-testbed: no probe child spawned


@pytest.mark.smoke
def test_device_init_blocks_true_on_hang(monkeypatch):
    # Simulate the half-dead relay: the probe thread never finishes.
    # Patch the watchdog's touch target by injecting a jax stand-in whose
    # devices() blocks. device_init_blocks imports jax inside the thread,
    # so patching sys.modules is enough.
    import sys

    class _HangingJax:
        def devices(self):
            threading.Event().wait(30)  # far past the watchdog budget

    monkeypatch.setitem(sys.modules, "jax", _HangingJax())
    t0 = time.monotonic()
    assert relay.device_init_blocks(timeout_s=0.5) is True
    assert time.monotonic() - t0 < 5.0
