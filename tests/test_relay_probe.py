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
