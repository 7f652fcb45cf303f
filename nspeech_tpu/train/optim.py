"""Optimizers and learning-rate schedules.

Mirrors the reference's training recipes:
- Tacotron-1 / WaveNet: Adam + Noam (tensor2tensor) decay, global-norm
  clip 1.0 (reference: tacotron.py:135-156,186-190);
- Tacotron-2: Adam + exponential decay with a half-life
  (reference: tacotron2.py:149-151).
Gradients are clipped BEFORE Adam, matching the reference's
compute->clip->apply order.
"""

from __future__ import annotations

import optax

from nspeech_tpu.config import Config


def noam_schedule(init_lr: float, warmup_steps: float = 4000.0):
    import jax.numpy as jnp

    def schedule(step):
        s = step + 1.0
        return init_lr * warmup_steps ** 0.5 * jnp.minimum(
            s * warmup_steps ** -1.5, s ** -0.5)

    return schedule


def exponential_halflife_schedule(init_lr: float, halflife: float):
    def schedule(step):
        return init_lr * 0.5 ** (step / halflife)

    return schedule


def make_schedule(cfg: Config, kind: str):
    """kind: 'noam' (taco1/wavenet) or 'halflife' (taco2) or 'constant'."""
    init_lr = cfg.initial_learning_rate
    if kind == "halflife":
        return exponential_halflife_schedule(init_lr, cfg.learning_rate_decay_halflife)
    if kind == "noam":
        if cfg.decay_learning_rate:
            return noam_schedule(init_lr)
        return lambda step: init_lr
    if kind == "constant":
        return lambda step: init_lr
    raise ValueError(f"Unknown schedule kind: {kind}")


SCHEDULE_BY_MODEL = {
    "taco1": "noam",
    "taco2": "halflife",
    "wavenet": "noam",
    "simple_wavenet": "noam",
}


def make_optimizer(cfg: Config, model_name: str, gradient_clip: float = 1.0):
    """optax chain: global-norm clip -> Adam(beta1, beta2) -> lr schedule."""
    schedule = make_schedule(cfg, SCHEDULE_BY_MODEL.get(model_name, "noam"))
    tx = optax.chain(
        optax.clip_by_global_norm(gradient_clip),
        optax.scale_by_adam(b1=cfg.adam["beta1"], b2=cfg.adam["beta2"]),
        optax.scale_by_learning_rate(schedule),  # handles the sign flip
    )
    return tx, schedule
