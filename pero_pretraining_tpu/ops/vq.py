"""Vector-quantization nearest-neighbour assignment.

The hot op of the VQ-VAE pipeline and of offline label production
(reference: models/autoencoders.py:212-219 — squared-L2 via expansion then
argmin). Formulated as one (R, D) x (D, K) matmul plus row/col norms so the
distance computation rides the MXU; `counts` and the EMA `dw` accumulation
are one-hot matmuls (also MXU) rather than scatters.

`vq_assign` keeps fp32 accumulation for bit-comparable argmin results across
backends (ties break to the lowest index, same as torch/np argmin).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def vq_distances(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Squared L2 distances. x: (R, D), codebook: (K, D) -> (R, K)."""
    x = x.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    x2 = jnp.sum(x**2, axis=1, keepdims=True)  # (R, 1)
    e2 = jnp.sum(codebook**2, axis=1)  # (K,)
    # HIGHEST precision: assignments must be reproducible across backends
    # (north-star "bit-comparable quantized targets", BASELINE.md) — default
    # TPU matmul precision feeds the MXU bf16 inputs, which can flip argmins
    cross = jax.lax.dot_general(
        x,
        codebook,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, K)
    return x2 + e2[None, :] - 2.0 * cross


def vq_assign(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest codebook index per row. x: (R, D) -> (R,) int32."""
    return jnp.argmin(vq_distances(x, codebook), axis=1).astype(jnp.int32)


def vq_lookup(indices: jax.Array, codebook: jax.Array) -> jax.Array:
    return jnp.take(codebook, indices, axis=0)


def vq_counts(indices: jax.Array, num_embeddings: int) -> jax.Array:
    """Per-code usage counts via one-hot reduction (float32, exact below 2^24)
    — the TPU scatter-avoidance recipe; jnp.bincount lowers to a slow scatter."""
    return jnp.sum(jax.nn.one_hot(indices, num_embeddings, dtype=jnp.float32), axis=0)


def vq_stats(indices: jax.Array, x: jax.Array, num_embeddings: int) -> Tuple[jax.Array, jax.Array]:
    """Per-code usage counts and per-code input sums (for EMA updates).

    Returns (counts (K,), dw (K, D)) computed with one-hot matmuls — the
    TPU-friendly equivalent of the reference's scatter + encodings.T @ x
    (models/autoencoders.py:217-234).
    """
    one_hot = jax.nn.one_hot(indices, num_embeddings, dtype=jnp.float32)  # (R, K)
    counts = jnp.sum(one_hot, axis=0)
    dw = jax.lax.dot_general(
        one_hot, x.astype(jnp.float32), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, D)
    return counts, dw
