"""Backend selection helper for the CLIs.

Some environments force a platform at interpreter start (a sitecustomize
registering a TPU plugin reads its own config before user code runs), so
the JAX_PLATFORMS env var alone may not stick. This updates the live jax
config, which works as long as no computation has run yet.
"""

from __future__ import annotations

import os


def set_platform(name: str | None) -> None:
    """name: 'cpu', 'tpu', 'axon', ... or None to keep the default.

    Also enables the persistent XLA compilation cache for every CLI: a
    restarted/resumed run (or a re-invoked serving process) with the same
    shapes pays the big-model compile once, not per process. Override the
    location with JAX_COMPILATION_CACHE_DIR; set NSPEECH_NO_COMPILE_CACHE=1
    to disable."""
    import jax

    if not os.environ.get("NSPEECH_NO_COMPILE_CACHE"):
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/nspeech_jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if not name:
        return
    jax.config.update("jax_platforms", name)
