"""Flash-attention kernel: forward and gradient parity vs the XLA path
(interpret-mode Pallas on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_pretraining_tpu.ops.attention import multi_head_attention


def _rand_qkv(rng, n=2, s=256, h=2, hd=64):
    q = rng.randn(n, s, h, hd).astype(np.float32) * 0.5
    k = rng.randn(n, s, h, hd).astype(np.float32) * 0.5
    v = rng.randn(n, s, h, hd).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_forward_matches_xla(rng):
    from pero_pretraining_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(rng)
    ref = multi_head_attention(q, k, v, impl="xla")
    out = flash_attention(q, k, v, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_gradients_match_xla(rng):
    from pero_pretraining_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(rng, n=1, s=128, h=2, hd=64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, impl="xla") ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4, err_msg=name)


def test_flash_ragged_fallback(rng):
    """Non-block-multiple sequence lengths fall back to the XLA path."""
    from pero_pretraining_tpu.ops.flash_attention import flash_attention

    q, k, v = _rand_qkv(rng, s=100)
    ref = multi_head_attention(q, k, v, impl="xla")
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
