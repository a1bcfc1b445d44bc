"""Negative-path tests: clear errors for user mistakes."""

import numpy as np
import pytest

from pero_pretraining_tpu.configs import MeshConfig
from pero_pretraining_tpu.parallel.mesh import create_mesh


def test_mesh_rejects_bad_shapes():
    import jax

    n = len(jax.devices())
    with pytest.raises(ValueError, match="not divide"):
        create_mesh(MeshConfig(data=-1, model=n + 1))
    if n > 1:
        with pytest.raises(ValueError, match="!= device count"):
            create_mesh(MeshConfig(data=1, model=1), devices=jax.devices())


def test_fit_rejects_misaligned_steps_per_call(rng):
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer
    import jax

    training = TrainingConfig()
    task = MaskedTask(
        BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=1, feedforward_dim=128, max_len=64),
        HeadConfig(in_features=64, out_features=16),
        training,
    )
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)
    batch = synthetic_masked_batch(rng, batch_size=2, width=128, num_labels=16)
    state = trainer.init_state(batch)
    with pytest.raises(ValueError, match="multiple of steps_per_call"):
        trainer.fit(state, [batch], end_iteration=10, view_step=5, steps_per_call=3)


def test_unknown_backbone_and_head():
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig
    from pero_pretraining_tpu.models.heads import build_head
    from pero_pretraining_tpu.models.transformer import build_backbone

    with pytest.raises(ValueError, match="Unknown backbone"):
        build_backbone(BackboneConfig(type="resnet"))
    with pytest.raises(ValueError, match="Unknown head"):
        build_head(HeadConfig(type="attention"))


def test_unknown_augmentation_and_loss():
    from pero_pretraining_tpu.data.augment import build_augmentations

    with pytest.raises(ValueError, match="Unknown augmentations"):
        build_augmentations("nonexistent")

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
    from pero_pretraining_tpu.pipelines.joint import JointEmbeddingTask

    with pytest.raises(ValueError, match="Unknown loss type"):
        JointEmbeddingTask(BackboneConfig(), HeadConfig(), TrainingConfig(), loss_type="simsiam")


def test_missing_store():
    from pero_pretraining_tpu.data.storage import open_store

    with pytest.raises(FileNotFoundError):
        open_store("/nonexistent/path/images.lmdb")
