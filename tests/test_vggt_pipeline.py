"""VggT backbone through the full training loop: BatchNorm batch_stats must
update functionally inside the jitted step, and eval must use running stats."""

import jax
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

VGGT = BackboneConfig(
    type="vggt",
    model_dim=64,
    num_heads=2,
    num_blocks=1,
    feedforward_dim=128,
    max_len=64,
    use_pero_vgg=True,
)


def test_vggt_masked_training_updates_batch_stats(rng):
    task = MaskedTask(VGGT, HeadConfig(in_features=64, out_features=32), TrainingConfig(learning_rate=1e-3, warmup_iterations=2))
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, task.training_config, mesh=mesh)

    batch = synthetic_masked_batch(rng, batch_size=2, width=128, num_labels=32)
    state = trainer.init_state(batch)
    assert "batch_stats" in state.model_state, "pero VGG stack must carry BatchNorm stats"
    stats0 = jax.device_get(state.model_state["batch_stats"])

    losses = []
    for _ in range(6):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    stats1 = jax.device_get(state.model_state["batch_stats"])
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(stats0), jax.tree_util.tree_leaves(stats1))
    )
    assert moved, "running BN stats did not update during training"

    # eval path runs with use_running_average (no mutation)
    loss, counts = jax.jit(task.eval_step)(
        state.params, state.model_state, {k: batch[k] for k in ("images", "labels")}, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))


def test_vggt_multichip(rng):
    task = MaskedTask(VGGT, HeadConfig(in_features=64, out_features=32), TrainingConfig())
    mesh = create_mesh(MeshConfig(data=4, model=2))
    trainer = Trainer(task, task.training_config, mesh=mesh)
    batch = synthetic_masked_batch(rng, batch_size=8, width=128, num_labels=32)
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
