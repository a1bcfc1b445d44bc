"""BYOL-style momentum target branch for joint embedding."""

import jax
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_paired_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.joint import JointEmbeddingTask
from pero_pretraining_tpu.training.trainer import Trainer

TINY = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=256)
HEAD = HeadConfig(type="mlp", in_features=64, hidden_dim=128, num_layers=2)
TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, seed=0)


def _leaves(tree):
    return jax.tree_util.tree_leaves(jax.device_get(tree))


def test_momentum_target_tracks_online(rng):
    task = JointEmbeddingTask(TINY, HEAD, TRAIN, loss_type="vicreg", momentum=0.9)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TRAIN, mesh=mesh)
    batch = synthetic_paired_batch(rng, batch_size=4, width=256)

    state = trainer.init_state(batch)
    assert "target_params" in state.model_state
    # target starts as an exact copy
    for a, b in zip(_leaves(state.params), _leaves(state.model_state["target_params"])):
        np.testing.assert_array_equal(a, b)

    online0 = _leaves(state.params)
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()

    online1 = _leaves(state.params)
    target1 = _leaves(state.model_state["target_params"])
    # target moved, but lags the online weights (EMA)
    moved = sum(float(np.abs(t - o0).sum()) for t, o0 in zip(target1, online0))
    assert moved > 0, "target must EMA-track the online weights"
    for o0, o1, t in zip(online0, online1, target1):
        dist_t = np.abs(t - o1).sum()
        dist_0 = np.abs(o0 - o1).sum()
        if dist_0 > 1e-6:
            assert dist_t <= dist_0 + 1e-6  # target sits between init and online


def test_momentum_matches_shared_when_zero(rng):
    """momentum=0 must be the original shared-weights path (exact)."""
    batch = synthetic_paired_batch(rng, batch_size=4, width=256)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])

    t0 = Trainer(JointEmbeddingTask(TINY, HEAD, TRAIN, "vicreg", momentum=0.0), TRAIN, mesh=mesh)
    s0 = t0.init_state(batch)
    s0, m0 = t0.train_step(s0, batch)

    t1 = Trainer(JointEmbeddingTask(TINY, HEAD, TRAIN, "vicreg"), TRAIN, mesh=mesh)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
