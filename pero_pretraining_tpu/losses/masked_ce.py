"""Masked-label-prediction cross entropy.

Numerically equivalent to the reference (masked_pretraining/model.py:72-95)
but with static shapes: instead of boolean-gathering `output[mask == 1]` the
per-position CE is weighted by the mask and mean-reduced by the mask count.
Label -1 marks padding (no label) exactly as in the reference's collation
(common/dataloader.py:61).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax


def _mean_ce(logits: jax.Array, labels: jax.Array, weights: jax.Array) -> jax.Array:
    """Mean CE over positions with weight 1; safe when the weight sum is 0."""
    safe_labels = jnp.maximum(labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), safe_labels)
    total = jnp.sum(weights)
    return jnp.sum(ce * weights) / jnp.maximum(total, 1.0)


def masked_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    unmasked_weight: Optional[float] = None,
) -> Dict[str, jax.Array]:
    """logits: (N, S, V); labels: (N, S) int with -1 = no label; mask: (N, S)
    with 1 = masked (predict). Optional extra CE over unmasked-but-real
    positions weighted by `unmasked_weight` (reference: model.py:84-93)."""
    masked_w = (mask == 1).astype(jnp.float32)
    loss = _mean_ce(logits, labels, masked_w)
    result = {"loss": loss, "loss.masked": loss}

    if unmasked_weight is not None:
        unmasked_w = ((mask == 0) & (labels >= 0)).astype(jnp.float32)
        unmasked_loss = _mean_ce(logits, labels, unmasked_w)
        result["loss.unmasked"] = unmasked_loss
        result["loss"] = loss + unmasked_weight * unmasked_loss

    return result
