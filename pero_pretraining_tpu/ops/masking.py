"""Pixel-space patch masking for masked pre-training.

The reference replaces masked 40x8 patches with a fixed random-noise tile
generated once with numpy seed 42 and hard-coded to CUDA (reference:
models/transformers.py:29-34, mask application :53-68). Here the tile is a
constant baked into the jitted program and the replacement is a fused
`jnp.where` — no host round-trip, no in-place mutation.

Mask semantics (identical to the reference):
- `mask` has shape (N, S) with S = W // patch_w; 1 = replace the patch with
  the noise tile, 0 = keep the image content.
- the same tile pattern repeats horizontally, so patch s sees the same noise
  regardless of position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def make_mask_tile(height: int = 40, patch_w: int = 8, channels: int = 3, seed: int = 42) -> np.ndarray:
    """(height, patch_w, channels) float32 noise tile in [0, 1).

    Bit-identical to the reference's tile: numpy seed 42, `rand` drawn in
    (1, C, H, W) order (reference: models/transformers.py:30-32), transposed
    here to NHWC.
    """
    rng = np.random.RandomState(seed)
    tile_nchw = rng.rand(1, channels, height, patch_w)  # matches reference draw order
    tile = np.ascontiguousarray(tile_nchw[0].transpose(1, 2, 0)).astype(np.float32)
    return tile


def apply_patch_mask(x: jax.Array, mask: jax.Array, tile: jax.Array) -> jax.Array:
    """Replace masked patches with the noise tile.

    x:    (N, H, W, C) float, already normalized to [0, 1]
    mask: (N, S) integer, S = W // patch_w
    tile: (H, patch_w, C)
    """
    n, h, w, c = x.shape
    s = mask.shape[1]
    patch_w = w // s
    # stretch (N, S) -> (N, 1, W, 1); repeat is a cheap broadcast in XLA
    pixel_mask = jnp.repeat(mask, patch_w, axis=1).reshape(n, 1, w, 1)
    # tile the noise horizontally across the full width
    pattern = jnp.tile(tile, (1, s, 1)).reshape(1, h, w, c)
    return jnp.where(pixel_mask == 1, pattern, x)


def sample_span_mask(
    rng: jax.Array, labels: jax.Array, masking_prob: float, span_length: int = 3
) -> jax.Array:
    """Contiguous-span masking (SpanBERT-style) at the same expected coverage
    as iid Bernoulli(masking_prob).

    Span starts are sampled with probability masking_prob / span_length and
    dilated rightward to `span_length` frames with a max-pool — a static-shape
    formulation with no host loops. Restricted to real-content patches like
    the iid sampler. (The reference only has iid masking,
    masked_pretraining/batch_operator.py:27-32; spans are the natural
    extension for targets with temporal structure.)
    """
    p_start = min(1.0, masking_prob / max(span_length, 1))
    starts = jax.random.bernoulli(rng, p=p_start, shape=labels.shape).astype(jnp.float32)
    # dilate: frame j is masked if any start in [j - span_length + 1, j]
    window = jnp.ones((span_length,), dtype=jnp.float32)
    padded = jnp.pad(starts, ((0, 0), (span_length - 1, 0)))
    spans = jax.vmap(lambda row: jnp.convolve(row, window, mode="valid"))(padded)
    return ((spans > 0) & (labels >= 0)).astype(jnp.int32)


def sample_patch_mask(rng: jax.Array, labels: jax.Array, masking_prob: float) -> jax.Array:
    """iid Bernoulli(masking_prob) patch mask restricted to real-content patches.

    Mirrors the reference's host-side numpy sampling (reference:
    masked_pretraining/batch_operator.py:27-32): mask = Bernoulli AND labels >= 0.
    Runs on device with a JAX key so the whole step stays inside one program.
    """
    bern = jax.random.bernoulli(rng, p=masking_prob, shape=labels.shape)
    return (bern & (labels >= 0)).astype(jnp.int32)
