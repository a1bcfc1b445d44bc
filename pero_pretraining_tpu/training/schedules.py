"""Learning-rate schedules.

The reference uses polynomial warmup to a constant base LR
(reference: common/lr_scheduler.py:14-24): lr(i) = (i / warmup)^order * base
for i <= warmup, then base. (The reference's `_last` typo at :16 is a bug we
do not replicate.)
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_polynomial_schedule(base_lr: float, warmup_iterations: int, order: int = 1):
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if warmup_iterations <= 0:
            return jnp.asarray(base_lr, dtype=jnp.float32)
        frac = jnp.minimum(step / warmup_iterations, 1.0)
        return (frac**order) * base_lr

    return schedule


def warmup_cosine_schedule(
    base_lr: float,
    warmup_iterations: int,
    total_iterations: int,
    order: int = 1,
    min_lr_fraction: float = 0.0,
):
    """Polynomial warmup to base_lr, then cosine decay to
    `min_lr_fraction * base_lr` at `total_iterations` (capability extension —
    the reference only has warmup-then-constant)."""
    warmup = warmup_polynomial_schedule(base_lr, warmup_iterations, order)
    decay_steps = max(total_iterations - warmup_iterations, 1)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        progress = jnp.clip((step - warmup_iterations) / decay_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        decayed = (min_lr_fraction + (1.0 - min_lr_fraction) * cos) * base_lr
        return jnp.where(step < warmup_iterations, warmup(step), decayed)

    return schedule


def build_schedule(config):
    """TrainingConfig -> LR schedule callable (step -> lr)."""
    name = getattr(config, "schedule", "constant")
    if name == "constant":
        return warmup_polynomial_schedule(
            config.learning_rate, config.warmup_iterations, config.warmup_polynomial_order
        )
    if name == "cosine":
        return warmup_cosine_schedule(
            config.learning_rate,
            config.warmup_iterations,
            config.end_iteration,
            config.warmup_polynomial_order,
            getattr(config, "min_lr_fraction", 0.0),
        )
    raise ValueError(f"unknown schedule {name!r} (expected 'constant' or 'cosine')")
