"""Joint-embedding pipeline smoke tests (VICReg and NT-Xent)."""

import jax
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_paired_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.joint import JointEmbeddingTask
from pero_pretraining_tpu.training.trainer import Trainer

TINY_BACKBONE = BackboneConfig(
    type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=256, random_shift=True
)
TINY_HEAD = HeadConfig(type="mlp", in_features=64, hidden_dim=128, num_layers=2)
TINY_TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, seed=0)


def _run(loss_type, rng, steps=12):
    task = JointEmbeddingTask(TINY_BACKBONE, TINY_HEAD, TINY_TRAIN, loss_type=loss_type)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
    batch = synthetic_paired_batch(rng, batch_size=4, width=256)
    state = trainer.init_state(batch)
    losses = []
    for _ in range(steps):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, metrics


def test_vicreg_training(rng):
    losses, metrics = _run("vicreg", rng)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for key in ("loss.variance", "loss.invariance", "loss.covariance"):
        assert key in metrics


def test_ntxent_training(rng):
    losses, _ = _run("ntxent", rng)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_multichip_joint(rng):
    task = JointEmbeddingTask(TINY_BACKBONE, TINY_HEAD, TINY_TRAIN, loss_type="vicreg")
    mesh = create_mesh(MeshConfig(data=4, model=2))
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
    batch = synthetic_paired_batch(rng, batch_size=8, width=256)
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
