"""Non-EMA VectorQuantizer (decay=0): the codebook is a PARAM trained through
the q-latent loss (reference: models/autoencoders.py:186-187, :193-202)."""

import jax
import numpy as np

from pero_pretraining_tpu.configs import AutoencoderConfig, MeshConfig, TrainingConfig, VQConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.autoencoder import AutoencoderTask
from pero_pretraining_tpu.training.trainer import Trainer


def test_vqvae_gradient_codebook_trains(rng):
    cfg = AutoencoderConfig(
        type="vqvae",
        base_channels=8,
        decoder_base_channels=32,
        vq=VQConfig(num_embeddings=32, embeddings_dim=16, decay=0.0),
    )
    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=0, seed=0)
    task = AutoencoderTask(cfg, training)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    batch = synthetic_masked_batch(rng, batch_size=4, width=128)
    state = trainer.init_state(batch)

    # decay=0: codebook lives in params, no vq collection
    assert "embedding" in state.params["vq"]
    assert "vq" not in state.model_state
    codebook0 = np.asarray(state.params["vq"]["embedding"])
    # reference init: uniform(-1/K, 1/K)
    assert np.abs(codebook0).max() <= 1.0 / 32 + 1e-6

    losses = []
    for _ in range(12):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()

    # Faithful reference quirk: the straight-through detach sits between the
    # codebook and the loss (models/autoencoders.py:222,:239), so in decay=0
    # mode the embedding receives NO gradient — it must stay exactly at init.
    codebook1 = np.asarray(state.params["vq"]["embedding"])
    np.testing.assert_array_equal(codebook0, codebook1)
