"""Frame-level VICReg loss with static shapes.

Reference semantics (joint_embedding_pretraining/losses.py:3-47):
- invariance: MSE between view-1 frames in the shared region and the
  *order-aligned* view-2 frames (`x[shift_masks1==1]` vs `y[shift_masks2==1]`);
  the boolean gathers align frames showing the same image content.
- variance hinge + covariance penalty over ALL real-content frames of both
  views pooled (`image_masks == 1`), torch-style unbiased (n-1) statistics.

TPU redesign: the dynamic boolean gathers become fixed-shape masked
reductions. Alignment is done by rolling view 2 by each line's shift
(`y_aligned[j] = y[j - shift]`), which reproduces the reference's in-order
pairing exactly (shift_masks2 is shift_masks1 reversed —
common/dataloader.py:135 — so the k-th selected frame on each side sits at
aligned positions). Shift-mask value 2 (= shared but padding,
common/dataloader.py:137-138) is excluded, as in the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _align_view2(y: jax.Array, shifts: jax.Array) -> jax.Array:
    """Per-line roll: y_aligned[:, j] = y[:, j - shift]. (N, S, D)."""
    return jax.vmap(lambda yi, s: jnp.roll(yi, s, axis=0))(y, shifts)


def _pair_validity(shift_masks1: jax.Array, shift_masks2: jax.Array, shifts: jax.Array) -> jax.Array:
    """(N, S) float: 1 where the aligned frame pair is shared real content."""
    m2_aligned = _align_view2(shift_masks2, shifts)
    return ((shift_masks1 == 1) & (m2_aligned == 1)).astype(jnp.float32)


def _masked_moments(z: jax.Array, w: jax.Array):
    """Unbiased per-dim variance and covariance of rows of z with 0/1 row
    weights w. z: (R, D), w: (R,). Returns (var (D,), cov (D, D), n)."""
    n = jnp.sum(w)
    mean = jnp.sum(z * w[:, None], axis=0) / jnp.maximum(n, 1.0)
    centered = (z - mean) * w[:, None]
    cov = (centered.T @ centered) / jnp.maximum(n - 1.0, 1.0)
    return jnp.diagonal(cov), cov, n


def vicreg_loss(
    x: jax.Array,
    y: jax.Array,
    image_masks1: jax.Array,
    image_masks2: jax.Array,
    shift_masks1: jax.Array,
    shift_masks2: jax.Array,
    shifts: jax.Array,
    *,
    variance_weight: float = 1.0,
    invariance_weight: float = 1.0,
    covariance_weight: float = 1.0,
    variance_threshold: float = 1.0,
    eps: float = 1e-5,
) -> Dict[str, jax.Array]:
    """x, y: (N, S, D) frame embeddings of the two views.

    Masks are (N, S) ints; shifts (N,) int total per-line shift between views
    (common/dataloader.py:126)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n_, s_, d = x.shape

    # --- invariance: masked MSE over aligned shared frames -------------------
    y_aligned = _align_view2(y, shifts)
    pair_w = _pair_validity(shift_masks1, shift_masks2, shifts)
    diff2 = jnp.sum((x - y_aligned) ** 2, axis=-1)  # (N, S)
    n_pairs = jnp.sum(pair_w)
    invariance = jnp.sum(diff2 * pair_w) / jnp.maximum(n_pairs * d, 1.0)

    # --- variance / covariance over pooled real-content frames ---------------
    z = jnp.concatenate([x.reshape(-1, d), y.reshape(-1, d)], axis=0)
    w = jnp.concatenate(
        [(image_masks1 == 1).reshape(-1), (image_masks2 == 1).reshape(-1)]
    ).astype(jnp.float32)
    var, cov, _ = _masked_moments(z, w)

    variance = jnp.mean(jax.nn.relu(variance_threshold - jnp.sqrt(var + eps)))
    off_diag = cov - jnp.diag(jnp.diagonal(cov))
    covariance = jnp.sum(off_diag**2) / d

    loss = variance_weight * variance + invariance_weight * invariance + covariance_weight * covariance
    return {
        "loss": loss,
        "loss.variance": variance,
        "loss.invariance": invariance,
        "loss.covariance": covariance,
    }
