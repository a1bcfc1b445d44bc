"""Functional train state.

Everything the reference mutates in place — optimizer moments, BatchNorm
running stats, the VQ-VAE EMA codebook (reference: models/autoencoders.py:
225-237 mutates buffers inside forward) — is carried explicitly here and
threaded through the jitted, donated train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array  # int32 scalar
    params: Any
    model_state: Any  # dict of extra variable collections (batch_stats, vq, ...)
    opt_state: Any
    rng: jax.Array  # base PRNG key; per-step keys are fold_in(rng, step)

    def step_rng(self) -> jax.Array:
        return jax.random.fold_in(self.rng, self.step)

    @classmethod
    def create(cls, params, model_state, opt_state, seed: int) -> "TrainState":
        return cls(
            step=jnp.asarray(0, dtype=jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            rng=jax.random.PRNGKey(seed),
        )
