"""Backend selection helper for the CLIs.

Some environments force a platform at interpreter start (a sitecustomize
registering a TPU plugin reads its own config before user code runs), so
the JAX_PLATFORMS env var alone may not stick. This updates the live jax
config, which works as long as no computation has run yet.
"""

from __future__ import annotations


def set_platform(name: str | None) -> None:
    """name: 'cpu', 'tpu', 'axon', ... or None to keep the default."""
    if not name:
        return
    import jax

    jax.config.update("jax_platforms", name)
