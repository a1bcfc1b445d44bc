"""Per-line frame-contrastive NT-Xent loss, fully vectorized.

Reference semantics (joint_embedding_pretraining/losses.py:51-83): per text
line, L2-normalize frames, select the shared frames of both views, build the
(n, n) similarity matrix x @ y.T / temperature, and take
-log(diag softmax over columns) — i.e. for each aligned positive pair the
denominator runs over the view-1 frames of the same line. Negatives come from
other positions in the SAME line, not other lines.

The reference loops over lines in Python (losses.py:61-63) — a serial
bottleneck. Here the whole batch is one vmapped fixed-shape computation:
view 2 is aligned by rolling with the per-line shift, validity is a mask, and
the softmax is masked instead of sliced. A stable masked logsumexp replaces
the reference's raw exp (identical value up to float error).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _line_loss(x, y, sm1, sm2, shift, temperature):
    """x, y: (S, D) L2-normalized frames of one line."""
    s, d = x.shape
    y_aligned = jnp.roll(y, shift, axis=0)
    sm2_aligned = jnp.roll(sm2, shift, axis=0)

    row_valid = (sm1 == 1)  # view-1 frames allowed in the denominator
    pair_valid = row_valid & (sm2_aligned == 1)  # aligned positive pairs

    sim = (x @ y_aligned.T) / temperature  # (S rows = view1, S cols = view2)
    sim = jnp.where(row_valid[:, None], sim, _NEG_INF)

    log_denom = jax.nn.logsumexp(sim, axis=0)  # per column: over view-1 frames
    pos = jnp.diagonal(sim)
    losses = log_denom - pos

    n = jnp.sum(pair_valid)
    return jnp.sum(jnp.where(pair_valid, losses, 0.0)) / jnp.maximum(n, 1)


def ntxent_loss(
    x: jax.Array,
    y: jax.Array,
    image_masks1: jax.Array,
    image_masks2: jax.Array,
    shift_masks1: jax.Array,
    shift_masks2: jax.Array,
    shifts: jax.Array,
    *,
    temperature: float = 0.1,
) -> Dict[str, jax.Array]:
    """x, y: (N, S, D) frame embeddings (un-normalized); masks (N, S); shifts (N,)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)

    per_line = jax.vmap(_line_loss, in_axes=(0, 0, 0, 0, 0, None))(
        x, y, shift_masks1, shift_masks2, shifts, temperature
    )
    return {"loss": jnp.mean(per_line)}
