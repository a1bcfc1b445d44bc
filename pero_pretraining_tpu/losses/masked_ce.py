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


def _mean_of(ce: jax.Array, weights: jax.Array) -> jax.Array:
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def masked_cross_entropy_fused(
    frames: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    unmasked_weight: Optional[float] = None,
    num_chunks: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Same contract/metrics as masked_cross_entropy but with the linear head
    fused into the CE (ops/fused_ce.py): the (N, S, V) logits never
    materialize in HBM. frames: (N, S, D); kernel: (D, V); bias: (V,).

    num_chunks defaults to vocab/4096 (measured on v5e: chunking costs more
    than it saves below ~32k vocab — small matmuls underutilize the MXU and
    the backward rematerialization adds FLOPs; at 4096 one chunk is neutral
    and the win is avoiding the fp32 logits materialization)."""
    from pero_pretraining_tpu.ops.fused_ce import fused_linear_ce

    n, s, d = frames.shape
    if num_chunks is None:
        num_chunks = max(1, kernel.shape[1] // 4096)
    safe_labels = jnp.maximum(labels, 0).reshape(-1)
    ce = fused_linear_ce(frames.reshape(n * s, d), kernel, bias, safe_labels, num_chunks)
    ce = ce.reshape(n, s)

    masked_w = (mask == 1).astype(jnp.float32)
    loss = _mean_of(ce, masked_w)
    result = {"loss": loss, "loss.masked": loss}
    if unmasked_weight is not None:
        unmasked_w = ((mask == 0) & (labels >= 0)).astype(jnp.float32)
        unmasked_loss = _mean_of(ce, unmasked_w)
        result["loss.unmasked"] = unmasked_loss
        result["loss"] = loss + unmasked_weight * unmasked_loss
    return result
