"""Full PQ-AE configuration (BASELINE.json config 3) end-to-end: train an AE
tokenizer -> dump encoder features through the offline tools -> k-means ->
labels -> masked pretraining consumes them. Also covers dropout training."""

import sys

import jax
import numpy as np
import pytest

from pero_pretraining_tpu.configs import (
    AutoencoderConfig,
    BackboneConfig,
    HeadConfig,
    MeshConfig,
    TrainingConfig,
)
from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.storage import SqliteStore
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.autoencoder import AutoencoderTask
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.checkpoint import save_checkpoint
from pero_pretraining_tpu.training.trainer import Trainer


def _run(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    assert main() == 0


def test_pqae_chain(tmp_path, rng, monkeypatch):
    # corpus
    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "lines.txt")
    store = SqliteStore(store_path, readonly=False)
    with open(lines_path, "w") as f:
        for i in range(12):
            w = int(rng.randint(100, 300))
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"l{i}.png"
            store.put(image_id, encode_image(img, ".png"))
            f.write(f"{image_id}\n")
    store.commit()
    store.close()

    # 1) train a small AE briefly and checkpoint it
    ae_def = '{"type":"ae","base_channels":8,"decoder_base_channels":32}'
    ae_cfg = AutoencoderConfig.from_definition(
        {"type": "ae", "base_channels": 8, "decoder_base_channels": 32}
    )
    training = TrainingConfig(learning_rate=3e-4, warmup_iterations=0, seed=0)
    task = AutoencoderTask(ae_cfg, training)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch

    batch = synthetic_masked_batch(rng, batch_size=4, width=320)
    state = trainer.init_state(batch)
    for _ in range(5):
        state, _ = trainer.train_step(state, batch)
    ckpt = str(tmp_path / "ae.msgpack")
    save_checkpoint(state, ckpt)

    # 2) features from the TRAINED AE encoder
    from pero_pretraining_tpu.scripts.produce_features import main as produce_features

    features_path = str(tmp_path / "features.npy")
    _run(
        produce_features,
        ["pf", "--model-definition", ae_def, "--checkpoint-path", ckpt, "--lines-path", lines_path,
         "--lmdb-path", store_path, "--batch-size", "4", "--max-line-width", "320", "--output", features_path],
        monkeypatch,
    )

    # 3) k-means + labels
    from pero_pretraining_tpu.scripts.fit_kmeans import main as fit_kmeans
    from pero_pretraining_tpu.scripts.produce_kmeans_labels import main as produce_labels

    kmeans_path = str(tmp_path / "kmeans.npy")
    _run(
        fit_kmeans,
        ["fk", "--dataset", features_path, "--k", "16", "--batch-size", "64", "--iters", "2", "--output", kmeans_path],
        monkeypatch,
    )
    labels_path = str(tmp_path / "labels.trn")
    _run(
        produce_labels,
        ["pl", "--model-definition", ae_def, "--checkpoint-path", ckpt, "--kmeans-path", kmeans_path,
         "--lines-path", lines_path, "--lmdb-path", store_path, "--batch-size", "4",
         "--max-line-width", "320", "--output", labels_path],
        monkeypatch,
    )

    # 4) masked pretraining on the produced labels, with dropout active
    from pero_pretraining_tpu.data.batching import BatchCreator
    from pero_pretraining_tpu.data.dataset import LinesDataset
    from pero_pretraining_tpu.data.loader import DataLoader
    from pero_pretraining_tpu.training.tester import numeric_batch

    ds = LinesDataset(store_path, labels_path, max_width=320)
    loader = DataLoader(ds, BatchCreator(pad_to=320, seed=0), batch_size=4, shuffle=True, num_workers=2)

    m_training = TrainingConfig(learning_rate=1e-3, warmup_iterations=2, masking_prob=0.3)
    m_task = MaskedTask(
        BackboneConfig(
            type="vit", model_dim=64, num_heads=2, num_blocks=1, feedforward_dim=128, max_len=64, dropout=0.1
        ),
        HeadConfig(in_features=64, out_features=16),
        m_training,
    )
    m_trainer = Trainer(m_task, m_training, mesh=mesh)
    batches = [numeric_batch(b) for b in loader]
    m_state = m_trainer.init_state(batches[0])
    losses = []
    for b in batches + batches:
        m_state, metrics = m_trainer.train_step(m_state, b)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # dropout adds noise; just sane
