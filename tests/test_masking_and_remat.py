"""Span masking and rematerialization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig
from pero_pretraining_tpu.models.transformer import VisionTransformerEncoder
from pero_pretraining_tpu.ops.masking import sample_span_mask


def test_span_mask_structure():
    labels = jnp.zeros((8, 256), dtype=jnp.int32)  # all real content
    mask = np.asarray(sample_span_mask(jax.random.PRNGKey(0), labels, masking_prob=0.3, span_length=4))
    rate = mask.mean()
    assert 0.15 < rate < 0.45, f"coverage {rate} far from target 0.3"

    # masked frames must form runs: count isolated single-frame maskings —
    # with span length 4 the overwhelming majority of masked frames have a
    # masked neighbor
    padded = np.pad(mask, ((0, 0), (1, 1)))
    isolated = (padded[:, 1:-1] == 1) & (padded[:, :-2] == 0) & (padded[:, 2:] == 0)
    assert isolated.sum() / max(mask.sum(), 1) < 0.2

    # respects content boundaries
    labels2 = jnp.full((4, 64), -1, dtype=jnp.int32)
    mask2 = np.asarray(sample_span_mask(jax.random.PRNGKey(1), labels2, 0.5, 3))
    assert mask2.sum() == 0


def test_remat_matches_non_remat(rng):
    x = jnp.asarray(rng.rand(2, 40, 128, 3).astype(np.float32))
    base = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, random_shift=False)

    m1 = VisionTransformerEncoder(base)
    m2 = VisionTransformerEncoder(BackboneConfig(**{**base.__dict__, "remat": True}))
    variables = m1.init(jax.random.PRNGKey(0), x, train=False)

    y1 = m1.apply(variables, x, train=False)
    y2 = m2.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6, atol=1e-6)

    g1 = jax.grad(lambda v: jnp.sum(m1.apply(v, x, train=False) ** 2))(variables)
    g2 = jax.grad(lambda v: jnp.sum(m2.apply(v, x, train=False) ** 2))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
