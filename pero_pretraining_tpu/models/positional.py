"""Sin/cos positional encoding with per-sample random shift.

The reference adds a standard sinusoidal table and, during training, offsets
each batch element by a random start position to stop joint-embedding models
collapsing onto absolute position (reference: models/transformers.py:154-192;
the per-sample Python loop at :184-185 becomes a vmapped dynamic_slice here —
one gather, no host loop).
"""

from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def sincos_position_table(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) float32; identical formula to the reference
    (models/transformers.py:165-170): even dims sin, odd dims cos."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term)
    return table


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int = 4096
    random_shift: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, rng: jax.Array | None = None) -> jax.Array:
        """x: (N, S, D). When training with random_shift, each sample reads the
        table at a random offset in [0, max_len - S)."""
        n, s, d = x.shape
        table = jnp.asarray(sincos_position_table(self.max_len, self.d_model))

        if self.random_shift and train and self.max_len > s:
            if rng is None:
                rng = self.make_rng("positions")
            offsets = jax.random.randint(rng, (n,), 0, self.max_len - s)
            slices = jax.vmap(lambda o: jax.lax.dynamic_slice(table, (o, 0), (s, d)))(offsets)
            return x + slices.astype(x.dtype)

        return x + table[:s][None].astype(x.dtype)
