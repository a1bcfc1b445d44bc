"""Fused on-device preprocessing: shift augmentation + normalize + masks.

The north-star design (BASELINE.json) fuses height-normalize, image-shift
augmentation, patchify and span masking into one XLA stage feeding
HBM-resident batches. With this op, host collation only left-aligns lines
into the fixed canvas (a straight memcpy, no RNG); everything stochastic
happens INSIDE the jitted train step:

    uint8 batch -> [roll by per-line random left padding] -> /255
          -> frame masks -> Bernoulli/span patch mask -> pixel-noise masking
          -> patchify (in the backbone)

and XLA fuses the lot — one pass over the pixels, nothing materialized on
the host, and the per-step randomness comes from the fold_in(step) key so
training stays exactly resumable.

Equivalent to the host path (data/batching.py): the reference draws the left
padding in pixels and quantizes to frames (common/dataloader.py:89), i.e.
uniform over [0, s - w) frames; we draw the same distribution on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def device_shift_augment(
    rng: jax.Array,
    images: jax.Array,
    widths: jax.Array,
    labels: Optional[jax.Array] = None,
    subsampling: int = 8,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Place left-aligned lines at random left paddings, on device.

    images: (N, H, W, C) uint8/float, content left-aligned
    widths: (N,) int32 content width in FRAMES
    labels: optional (N, S) int32 left-aligned, -1 outside content

    Returns (images rolled, labels rolled, image_masks (N, S) int32).
    """
    n, h, w, c = images.shape
    s = w // subsampling

    # uniform left padding over [0, s - width) frames (0 when full-width)
    free = jnp.maximum(s - widths, 1)
    u = jax.random.uniform(rng, (n,))
    lp = jnp.floor(u * free.astype(u.dtype)).astype(jnp.int32)
    lp = jnp.where(widths >= s, 0, lp)

    rolled = jax.vmap(lambda img, shift: jnp.roll(img, shift * subsampling, axis=1))(images, lp)

    frame_idx = jnp.arange(s)[None, :]
    image_masks = ((frame_idx >= lp[:, None]) & (frame_idx < (lp + widths)[:, None])).astype(jnp.int32)

    rolled_labels = None
    if labels is not None:
        rolled_labels = jax.vmap(lambda row, shift: jnp.roll(row, shift, axis=0))(labels, lp)
        rolled_labels = jnp.where(image_masks == 1, rolled_labels, -1)

    return rolled, rolled_labels, image_masks
