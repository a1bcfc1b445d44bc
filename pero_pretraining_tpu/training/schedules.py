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
