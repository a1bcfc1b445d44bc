"""Unit tests for core ops: patchify, masking, positional encoding."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pero_pretraining_tpu.models.positional import sincos_position_table
from pero_pretraining_tpu.ops.masking import apply_patch_mask, make_mask_tile, sample_patch_mask
from pero_pretraining_tpu.ops.patchify import patchify


def test_patchify_matches_strided_conv(rng):
    """reshape+matmul patchify == torch Conv2d(k=stride=(40,8)) (reference:
    models/transformers.py:99-109)."""
    n, h, w, c, d = 2, 40, 64, 3, 16
    x_nhwc = rng.rand(n, h, w, c).astype(np.float32)

    conv = torch.nn.Conv2d(c, d, kernel_size=(h, 8), stride=(h, 8))
    with torch.no_grad():
        ref = conv(torch.tensor(x_nhwc.transpose(0, 3, 1, 2)))  # (n, d, 1, w/8)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()  # (n, w/8, d)

    kernel = conv.weight.detach().numpy().reshape(d, -1).T  # (c*h*8, d), torch flatten order
    bias = conv.bias.detach().numpy()
    patches = patchify(jnp.asarray(x_nhwc), h, 8)
    out = np.asarray(patches @ kernel + bias)

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_mask_tile_matches_reference_seed():
    """Tile is bit-identical to the reference's seeded draw
    (models/transformers.py:30-32)."""
    tile = make_mask_tile(40, 8, 3, seed=42)
    np.random.seed(42)
    ref = np.random.rand(1, 3, 40, 8)[0].transpose(1, 2, 0)
    np.testing.assert_array_equal(tile, ref.astype(np.float32))
    assert tile.shape == (40, 8, 3)


def test_apply_patch_mask_semantics(rng):
    n, h, w, c = 2, 40, 64, 3
    s = w // 8
    x = rng.rand(n, h, w, c).astype(np.float32)
    mask = np.zeros((n, s), dtype=np.int32)
    mask[0, 2] = 1
    mask[1, 0] = 1

    tile = make_mask_tile(h, 8, c)
    out = np.asarray(apply_patch_mask(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(tile)))

    # masked patch replaced by the tile, independent of position
    np.testing.assert_array_equal(out[0, :, 16:24, :], tile)
    np.testing.assert_array_equal(out[1, :, 0:8, :], tile)
    # unmasked patches untouched
    np.testing.assert_array_equal(out[0, :, 0:16, :], x[0, :, 0:16, :])
    np.testing.assert_array_equal(out[1, :, 8:, :], x[1, :, 8:, :])


def test_sample_patch_mask_respects_labels():
    labels = jnp.asarray(np.array([[-1, -1, 0, 5, 7, -1], [3, 3, 3, 3, -1, -1]], dtype=np.int32))
    mask = sample_patch_mask(jax.random.PRNGKey(0), labels, masking_prob=1.0)
    np.testing.assert_array_equal(np.asarray(mask), (np.asarray(labels) >= 0).astype(np.int32))
    mask0 = sample_patch_mask(jax.random.PRNGKey(0), labels, masking_prob=0.0)
    assert np.asarray(mask0).sum() == 0


def test_positional_table_matches_torch_formula():
    """Same table as the reference's PositionalEncoding buffer
    (models/transformers.py:165-170)."""
    import math

    max_len, d = 128, 64
    table = sincos_position_table(max_len, d)

    pe = torch.zeros(max_len, d)
    position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)

    # numpy float32 sin/cos vs torch's differ in the last ulp near zeros
    np.testing.assert_allclose(table, pe.numpy(), rtol=1e-4, atol=1e-5)
