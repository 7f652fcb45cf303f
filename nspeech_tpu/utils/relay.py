"""Axon TPU-relay liveness detection, shared by every driver entry point.

This testbed reaches its one v5e through a localhost byte relay
(``JAX_PLATFORMS=axon``, relay process listening on 127.0.0.1:8082).
When the relay process is dead, jax's first device use BLOCKS forever —
the relayed backend init retries, it does not error — so anything that
might touch ``jax.devices()`` must probe the port first and route to a
CPU/virtual config (or fail fast) instead.

Centralized here because ``bench.py`` and ``__graft_entry__`` both need
the same two decisions and had started to drift:

* :func:`on_axon_testbed` — are we plausibly on the relay testbed at
  all?  On foreign hosts this is False and callers skip the probe
  entirely, keeping real-accelerator paths working.
* :func:`relay_dead` — testbed detected AND the port refuses.
"""

from __future__ import annotations

import os
import socket
from typing import NamedTuple

RELAY_HOST = "127.0.0.1"
RELAY_PORT = 8082

# The relay daemon script this testbed injects; its presence marks the
# testbed even when sitecustomize forces the axon platform without any
# env var being visible.
_RELAY_SCRIPT = os.path.expanduser("~/.tpu_init.py")


def on_axon_testbed() -> bool:
    """True when any marker of the axon relay testbed is present."""
    if "axon" in os.environ.get("JAX_PLATFORMS", "").lower():
        return True
    return os.path.exists(_RELAY_SCRIPT)


def port_refuses(host: str = RELAY_HOST, port: int = RELAY_PORT,
                 timeout: float = 2.0) -> bool:
    """True when nothing accepts on the relay port."""
    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect((host, port))
        return False
    except OSError:
        return True
    finally:
        s.close()


def relay_dead() -> bool:
    """True when this IS the axon testbed and its relay is unreachable
    (``jax.devices()`` would block forever). False on foreign hosts —
    callers may then use real devices normally."""
    return on_axon_testbed() and port_refuses()


def device_init_blocks(timeout_s: float = 60.0) -> bool:
    """Touch ``jax.devices()`` under a watchdog; True when it hangs.

    The port probe above cannot detect a HALF-DEAD relay: the daemon is a
    dumb byte pump to an external orchestrator over its own stdin/stdout,
    so when the upstream tunnel is gone the port still ACCEPTS but every
    byte written into it vanishes — backend init then blocks forever with
    no error (this exact state voided the round-3 bench record). The only
    reliable probe is the real thing: run the first device touch on a
    daemon thread and give up after ``timeout_s``.

    Returns True when init neither completed nor raised within the
    budget. On False the backend is initialized and cached — the caller's
    own ``jax.devices()`` is then instant. The daemon thread never blocks
    interpreter exit, but a hung backend init can leave the process
    unable to re-init cleanly, so callers should treat True as fatal for
    this process (fail fast, don't retry in-process).
    """
    import threading

    done = threading.Event()

    def touch() -> None:
        try:
            import jax

            jax.devices()
        except Exception:
            pass  # an ERROR is a live, decisive backend — not a hang
        finally:
            done.set()

    t = threading.Thread(target=touch, daemon=True, name="relay-probe")
    t.start()
    return not done.wait(timeout_s)


def device_exec_blocks(timeout_s: float = 300.0) -> bool:
    """Run ONE tiny on-device computation under a watchdog; True on hang.

    In-process building block only — production callers (bench.py,
    ``__graft_entry__``) use :func:`exec_probe_subprocess` instead: a hang
    here wedges THIS process's backend (exactly what the subprocess
    variant exists to avoid), so prefer the child-process probe anywhere
    the caller must survive a wedged tunnel.

    :func:`device_init_blocks` is not sufficient on its own: the relayed
    backend can report its device list instantly while the tunnel behind
    the relay is wedged, so only a real dispatch is decisive. Measured on
    this testbed (2026-08-20, relay freshly restarted): ``jax.devices()``
    returned in 0.2 s while the first tiny matmul took 221 s in one
    process and >300 s in the next — then the tunnel healed and the same
    dispatch cost 2.3 s. The default budget therefore stays generous
    (survive a cold upstream attach) while still converting an infinite
    hang into a clean, diagnosable failure.

    On False the attach cost is fully paid for this process — subsequent
    dispatches run at normal relay speed. As with the init probe, True
    means this process's backend may be wedged: fail fast, don't retry
    in-process.
    """
    import threading

    done = threading.Event()

    def run() -> None:
        try:
            import jax
            import jax.numpy as jnp

            # Small enough to be free, unusual enough (prime sizes) not to
            # collide with any cached real-workload executable.
            x = jnp.ones((13, 13), jnp.float32)
            float((x @ x).sum())
        except Exception:
            pass  # an ERROR is a live, decisive backend — not a hang
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True, name="relay-exec-probe")
    t.start()
    return not done.wait(timeout_s)


_PROBE_SNIPPET = (
    "import sys, time, jax, jax.numpy as jnp\n"
    # sitecustomize on this testbed forces the axon platform at interpreter
    # start, so an env var in the child is too late — honor an explicit
    # platform via the live config instead.
    "if len(sys.argv) > 1 and sys.argv[1]:\n"
    "    jax.config.update('jax_platforms', sys.argv[1])\n"
    "t0 = time.time()\n"
    "x = jnp.ones((13, 13), jnp.float32)\n"
    "float((x @ x).sum())\n"
    "print('DISPATCH_OK %.1f' % (time.time() - t0), flush=True)\n"
)


class ProbeResult(NamedTuple):
    """Outcome of one child-process dispatch probe.

    ``seconds`` is the measured dispatch time on success, else None.
    ``status`` discriminates the failure modes that used to collapse into
    one None — 'ok', 'timeout' (child killed at the watchdog: the
    hang-and-maybe-heal state), 'error' (child exited rc != 0 quickly: a
    real failure with a traceback worth reading), 'spawn-failed'.
    ``detail`` carries the child's stderr tail on 'error' so callers can
    surface the actual traceback instead of reporting a hang."""

    seconds: "float | None"
    status: str
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.status == "ok"


def exec_probe_subprocess(timeout_s: float = 240.0,
                          platform: "str | None" = None) -> ProbeResult:
    """Time one tiny on-device dispatch in a FRESH child process.

    Unlike :func:`device_exec_blocks`, a hang never wedges the CALLING
    process: the hung backend lives and dies in the child, so the caller
    can wait and retry — the wedged-tunnel state this guards against has
    been observed to heal within minutes (2026-08-20: tiny dispatch
    221 s, then 2.3 s, then a full 1100 s bench, then hung >300 s again
    minutes later). A hung child ('timeout') and an erroring child
    ('error') both deserve the fail-or-retry treatment on the axon
    testbed, but they are different diagnoses — the result says which,
    and carries the child's stderr tail on 'error'.

    On success the probe is recorded (:func:`mark_probe_ok`) so callers
    that run shortly after a healthy probe can skip paying a fresh child
    (~30-220 s of jax import + cold tunnel attach) via
    :func:`recent_probe_ok`.
    """
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET, platform or ""],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return ProbeResult(None, "timeout")
    except OSError as e:
        return ProbeResult(None, "spawn-failed", str(e))
    for line in out.stdout.splitlines():
        if line.startswith("DISPATCH_OK"):
            if not platform:  # only real-backend probes count as relay-ok
                mark_probe_ok()
            return ProbeResult(float(line.split()[1]), "ok")
    tail = "\n".join(out.stderr.strip().splitlines()[-8:])
    return ProbeResult(None, "error", "child rc=%s: %s" % (out.returncode,
                                                           tail or "<no stderr>"))


# A healthy dispatch probe is expensive through this relay (child pays a
# full jax import + tunnel attach, observed up to ~221 s cold); entry()'s
# compile check runs right after bench/_require_live_relay has already
# paid one. A timestamped marker lets the later caller trust the earlier
# result for a few minutes instead of doubling the cold-start.
_PROBE_MARKER = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "nspeech_relay_probe_ok")


def mark_probe_ok() -> None:
    try:
        with open(_PROBE_MARKER, "w") as f:
            f.write("ok\n")
    except OSError:
        pass  # marker is an optimization; never fail the probe over it


def recent_probe_ok(max_age_s: float = 600.0) -> bool:
    """True when a real-backend dispatch probe succeeded recently."""
    try:
        import time

        return (time.time() - os.path.getmtime(_PROBE_MARKER)) <= max_age_s
    except OSError:
        return False
