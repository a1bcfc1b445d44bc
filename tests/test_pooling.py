"""max_pool_nonoverlap: forward bit-equality with nn.max_pool, valid backward.

The op replaces flax's reduce_window max-pool in the VGG stacks (reference:
torch MaxPool2d in models/helpers.py:4-130) to avoid XLA's select-and-scatter
in the backward; see pero_pretraining_tpu/ops/pooling.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_pretraining_tpu.ops.pooling import max_pool_nonoverlap

SHAPES = [
    ((2, 40, 64, 3), (2, 2)),
    ((1, 20, 33, 8), (2, 2)),  # odd width: VALID drops the partial window
    ((2, 5, 16, 4), (2, 1)),  # the PERO stack's final pool at H=5
    ((1, 9, 10, 2), (3, 2)),
    ((2, 8, 8, 4), (1, 1)),
]


@pytest.mark.parametrize("shape,window", SHAPES)
def test_forward_matches_reduce_window(shape, window):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)
    ours = max_pool_nonoverlap(x, window)
    ref = nn.max_pool(x, window_shape=window, strides=window, padding="VALID")
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize("shape,window", SHAPES[:4])
def test_grad_matches_on_unique_inputs(shape, window):
    # all-distinct values -> no ties -> both backward rules route the
    # cotangent to the single argmax and must agree exactly
    n = int(np.prod(shape))
    x = jnp.asarray(np.random.RandomState(1).permutation(n).reshape(shape), jnp.float32)

    def loss_ours(v):
        return jnp.sum(max_pool_nonoverlap(v, window) ** 2)

    def loss_ref(v):
        return jnp.sum(nn.max_pool(v, window_shape=window, strides=window, padding="VALID") ** 2)

    g_ours = jax.grad(loss_ours)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=0, atol=0)


def test_grad_on_ties_is_a_valid_even_split():
    # a window of identical values: the max-reduction VJP splits the
    # cotangent evenly (select-and-scatter would route it to the first
    # element) — per-window cotangent mass must be conserved either way
    x = jnp.zeros((1, 2, 4, 1), jnp.float32)
    ct = jnp.asarray(np.arange(1, 3, dtype=np.float32).reshape(1, 1, 2, 1))
    _, vjp = jax.vjp(lambda v: max_pool_nonoverlap(v, (2, 2)), x)
    (gx,) = vjp(ct)
    gx = np.asarray(gx).reshape(2, 2, 2)  # (H, windows, w) view per window
    # each 2x2 window received its cotangent split into four equal parts
    np.testing.assert_allclose(gx[:, 0, :], np.full((2, 2), 1.0 / 4), atol=1e-7)
    np.testing.assert_allclose(gx[:, 1, :], np.full((2, 2), 2.0 / 4), atol=1e-7)
