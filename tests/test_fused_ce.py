"""Fused linear+CE (ops/fused_ce.py): value and gradient parity with the
unfused logits path, and full-task equivalence of the fused loss_fn."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pero_pretraining_tpu.losses.masked_ce import masked_cross_entropy, masked_cross_entropy_fused
from pero_pretraining_tpu.ops.fused_ce import fused_linear_ce


def _problem(rng, m=48, d=32, v=64):
    frames = rng.randn(m, d).astype(np.float32)
    kernel = (rng.randn(d, v) * 0.1).astype(np.float32)
    bias = (rng.randn(v) * 0.1).astype(np.float32)
    labels = rng.randint(0, v, size=m).astype(np.int32)
    return jnp.asarray(frames), jnp.asarray(kernel), jnp.asarray(bias), jnp.asarray(labels)


def test_fused_ce_value_matches_unfused(rng):
    frames, kernel, bias, labels = _problem(rng)
    ce = jax.jit(lambda *a: fused_linear_ce(*a, 8))(frames, kernel, bias, labels)
    logits = frames @ kernel + bias
    want = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_chunks", [1, 4])
def test_fused_ce_gradients_match(rng, num_chunks):
    frames, kernel, bias, labels = _problem(rng, m=24, d=16, v=32)
    weights = jnp.asarray((rng.rand(24) > 0.5).astype(np.float32))

    def fused_loss(f, k, b):
        ce = fused_linear_ce(f, k, b, labels, num_chunks)
        return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    def unfused_loss(f, k, b):
        logits = f @ k + b
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    got = jax.jit(jax.grad(fused_loss, argnums=(0, 1, 2)))(frames, kernel, bias)
    want = jax.jit(jax.grad(unfused_loss, argnums=(0, 1, 2)))(frames, kernel, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5)


def test_masked_ce_fused_matches_unfused(rng):
    n, s, d, v = 3, 16, 32, 64
    frames = jnp.asarray(rng.randn(n, s, d).astype(np.float32))
    kernel = jnp.asarray((rng.randn(d, v) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.randn(v) * 0.1).astype(np.float32))
    labels = jnp.asarray(rng.randint(-1, v, size=(n, s)).astype(np.int32))
    mask = jnp.asarray((rng.rand(n, s) < 0.3).astype(np.int32)) * (labels >= 0)

    logits = frames @ kernel + bias
    for uw in (None, 0.5):
        want = masked_cross_entropy(logits, labels, mask, uw)
        got = masked_cross_entropy_fused(frames, kernel, bias, labels, mask, uw, num_chunks=4)
        for key in want:
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key]), rtol=1e-5, atol=1e-5, err_msg=key
            )


def test_masked_task_fused_ce_matches_default(rng):
    """Full train step: fused and unfused tasks produce the same loss and the
    same parameter update from identical state."""
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    backbone = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=64)
    head = HeadConfig(in_features=64, out_features=128)
    batch = synthetic_masked_batch(rng, batch_size=2, width=256, num_labels=128)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])

    states, metrics = [], []
    for fused in (False, True):
        training = TrainingConfig(seed=0, fused_ce=fused, donate_state=False)
        task = MaskedTask(backbone, head, training)
        trainer = Trainer(task, training, mesh=mesh)
        state = trainer.init_state(batch)
        for _ in range(3):
            state, m = trainer.train_step(state, numeric_batch(batch))
        states.append(state)
        metrics.append(float(m["loss"]))

    assert np.isclose(metrics[0], metrics[1], rtol=1e-4, atol=1e-5), metrics
    a = jax.tree_util.tree_leaves(states[0].params)
    b = jax.tree_util.tree_leaves(states[1].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-3, atol=2e-5)


def test_masked_task_fused_ce_on_mesh(rng):
    """fused CE must compile and train under (data x model) sharding — the
    head kernel is sharded on the model axis; the chunk reshape must not
    break GSPMD propagation."""
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    backbone = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=1, feedforward_dim=128, max_len=64)
    head = HeadConfig(in_features=64, out_features=128)
    batch = numeric_batch(synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=128))
    mesh = create_mesh(MeshConfig(data=4, model=2))

    training = TrainingConfig(seed=0, fused_ce=True)
    task = MaskedTask(backbone, head, training)
    trainer = Trainer(task, training, mesh=mesh)
    state = trainer.init_state(batch)
    losses = []
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
