"""Sequence-parallel ring attention (parallel/ring.py).

The reference has no sequence parallelism (SURVEY.md §2.7: long lines are
truncated or concatenated, common/dataset.py:80, 206-236); this is a
beyond-parity scaling capability, so its correctness bar is equality with
the default XLA attention path — forward, gradients, and a full train step
on a combined (data x seq x model) mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.ops.attention import multi_head_attention
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.parallel.ring import ring_attention
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

TINY_BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=512)
TINY_HEAD = HeadConfig(in_features=64, out_features=50)
TINY_TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0)


def _qkv(rng, n=4, s=64, h=4, d=32):
    return tuple(jnp.asarray(rng.randn(n, s, h, d), jnp.float32) for _ in range(3))


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (2, 4, 1), (2, 2, 2)])
def test_ring_matches_xla_forward(rng, mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    q, k, v = _qkv(rng)
    ref = multi_head_attention(q, k, v)
    data, seq, model = mesh_shape
    mesh = create_mesh(MeshConfig(data=data, seq=seq, model=model))
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ring_matches_xla_gradients(rng):
    q, k, v = _qkv(rng)
    mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring_attention(q, k, v, mesh=mesh)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(multi_head_attention(q, k, v)))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ring_rejects_indivisible_sequence(rng):
    mesh = create_mesh(MeshConfig(data=1, seq=8, model=1))
    q, k, v = _qkv(rng, s=60)  # 60 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh=mesh)


def test_ring_bf16_inputs(rng):
    """bf16 q/k/v travel the ring in bf16 (half the ICI bytes) but accumulate
    in fp32 — must match the XLA path's fp32-softmax result at bf16 tolerance."""
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(rng))
    mesh = create_mesh(MeshConfig(data=1, seq=4, model=2))
    ref = multi_head_attention(q, k, v)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_sequence_parallel_train_step_matches_single_device(rng):
    """Full masked train step on a (2 data x 2 seq x 2 model) mesh with ring
    attention + seq-sharded activations reproduces the single-device update."""
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)

    task1 = MaskedTask(TINY_BACKBONE, TINY_HEAD, TINY_TRAIN)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, TINY_TRAIN, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    mesh8 = create_mesh(MeshConfig(data=2, seq=2, model=2))
    task8 = MaskedTask(TINY_BACKBONE, TINY_HEAD, TINY_TRAIN, attention_impl="ring", mesh=mesh8)
    t8 = Trainer(task8, TINY_TRAIN, mesh=mesh8)
    s8 = t8.init_state(batch)
    s8, m8 = t8.train_step(s8, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    p1 = jax.device_get(s1.params)
    p8 = jax.device_get(s8.params)
    for l1, l8 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)

    # a second step must also run (exercises donated-buffer path + resharding)
    s8, m8 = t8.train_step(s8, batch)
    assert np.isfinite(float(m8["loss"]))


def test_ring_q_chunked_path_matches_unchunked(rng, monkeypatch):
    """Forcing a tiny _Q_CHUNK exercises the chunked score-tile path; the
    result (and gradients) must be identical to the unchunked ring."""
    import pero_pretraining_tpu.parallel.ring as ring_mod

    q, k, v = _qkv(rng, s=64)
    mesh = create_mesh(MeshConfig(data=1, seq=2), devices=jax.devices()[:2])

    ref = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(q, k, v)
    g_ref = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(jnp.sin(ring_attention(q, k, v, mesh=mesh))), argnums=(0, 1, 2))
    )(q, k, v)

    monkeypatch.setattr(ring_mod, "_Q_CHUNK", 8)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(q, k, v)
    g_out = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(jnp.sin(ring_attention(q, k, v, mesh=mesh))), argnums=(0, 1, 2))
    )(q, k, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
