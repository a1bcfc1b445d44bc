"""VGG conv stacks in NHWC flax.

Ports of behavior, not code, from the reference layer factories
(reference: models/helpers.py:4-130):

- `VggEncoderStack` — configurable VGG encoder: per-block channel doubling,
  per-axis subsampling until the patch size is reached, BatchNorm on the last
  block (reference: create_vgg_encoder, models/helpers.py:4-56).
- `PeroVggStack` — the exact PERO-OCR production conv plan 64-64/128-128/
  256-256-256/512-512 with a final (2,1) pool, BatchNorm and dropout
  (reference: create_pero_vgg_layers, models/helpers.py:97-130).
- `VggDecoderStack` — mirror decoder with bilinear upsampling (reference:
  create_vgg_decoder, models/helpers.py:59-94).

All modules run in NHWC (TPU-native layout); BatchNorm statistics live in the
`batch_stats` collection and are threaded functionally through train steps.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv(features: int, name: str, dtype) -> nn.Conv:
    return nn.Conv(features, kernel_size=(3, 3), strides=(1, 1), padding="SAME", name=name, dtype=dtype)


def block_subsamplings(num_blocks: int, patch_size: Tuple[int, int]) -> list[Tuple[int, int]]:
    """Per-block pooling factors: halve each axis until its patch size is
    reached (reference: models/helpers.py:12-19)."""
    subs = []
    current = [1, 1]
    for _ in range(num_blocks):
        s = [1, 1]
        for axis in range(2):
            if current[axis] < patch_size[axis]:
                s[axis] = 2
                current[axis] *= 2
        subs.append((s[0], s[1]))
    return subs


class VggEncoderStack(nn.Module):
    """Configurable VGG encoder (reference: models/helpers.py:4-56)."""

    base_channels: int = 64
    num_conv_blocks: int = 3
    num_conv_layers: Sequence[int] = (2, 2, 3)
    patch_size: Tuple[int, int] = (40, 8)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        subs = block_subsamplings(self.num_conv_blocks, self.patch_size)
        for i in range(self.num_conv_blocks):
            features = self.base_channels * (2**i)
            for j in range(self.num_conv_layers[i]):
                x = _conv(features, f"block{i}_conv{j}", self.dtype)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, window_shape=subs[i], strides=subs[i], padding="VALID")
            if i == self.num_conv_blocks - 1:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"block{i}_bn", dtype=self.dtype
                )(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class PeroVggStack(nn.Module):
    """The canonical PERO-OCR conv stack (reference: models/helpers.py:97-130).

    Channel plan 64-64 | 128-128 | 256-256-256 | 512-512, pools (2,2)x3 then
    (2,1), LeakyReLU(0.01) on the 512 convs, BatchNorm(512) at the end.
    Input H=40 -> output H=2; width subsampled 8x.
    """

    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        plan = [
            ((64, 64), (2, 2), nn.relu),
            ((128, 128), (2, 2), nn.relu),
            ((256, 256, 256), (2, 2), nn.relu),
            ((512, 512), (2, 1), lambda v: nn.leaky_relu(v, negative_slope=0.01)),
        ]
        for b, (channels, pool, act) in enumerate(plan):
            for j, ch in enumerate(channels):
                x = _conv(ch, f"block{b}_conv{j}", self.dtype)(x)
                x = act(x)
            x = nn.max_pool(x, window_shape=pool, strides=pool, padding="VALID")
            if b < len(plan) - 1 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class PeroVggEncoder(nn.Module):
    """PERO-OCR transfer-learning feature extractor: the PERO conv stack plus
    a height-collapsing aggregation conv to `out_channels` features per 8-px
    frame (reference: create_pero_vgg_encoder, models/helpers.py:133-173 —
    minus the nested wrapper classes that only exist to match torch
    state-dict key names). Used as the frozen encoder for Feature
    Quantization targets (SURVEY.md §2.6)."""

    out_channels: int = 768
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = PeroVggStack(dropout=self.dropout, dtype=self.dtype, name="blocks_2d")(x, train=train)
        agg_height = x.shape[1]
        x = nn.Conv(
            self.out_channels,
            kernel_size=(agg_height, 1),
            strides=(1, 1),
            padding="VALID",
            name="aggregation_conv",
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return x  # (N, 1, S, out_channels)


class VggDecoderStack(nn.Module):
    """Mirror decoder with bilinear upsampling (reference: models/helpers.py:59-94).

    Each block: (n-1) same-channel convs + a channel-halving conv, ReLU,
    dropout, then 2x bilinear upsample; final 3x3 conv to `out_channels`.
    """

    out_channels: int = 3
    base_channels: int = 256
    num_conv_blocks: int = 3
    num_conv_layers: Sequence[int] = (3, 2, 2)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_ch = self.base_channels
        for i in range(self.num_conv_blocks):
            out_ch = in_ch // 2
            for j in range(self.num_conv_layers[i] - 1):
                x = _conv(in_ch, f"block{i}_conv{j}", self.dtype)(x)
                x = nn.relu(x)
            x = _conv(out_ch, f"block{i}_out", self.dtype)(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")
            in_ch = out_ch
        x = _conv(self.out_channels, "final", self.dtype)(x)
        return x
