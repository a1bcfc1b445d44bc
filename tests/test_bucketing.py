"""Width-bucketed loader tests + bucketed training across shapes."""

import numpy as np
import jax

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.bucketing import BucketedDataLoader, bucket_for
from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.storage import SqliteStore
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.tester import numeric_batch
from pero_pretraining_tpu.training.trainer import Trainer


def test_bucket_for():
    assert bucket_for(100, (512, 1024)) == 512
    assert bucket_for(512, (512, 1024)) == 512
    assert bucket_for(513, (512, 1024)) == 1024
    assert bucket_for(9999, (512, 1024)) == 1024


def _corpus(tmp_path, rng, n=24):
    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "lines.txt")
    store = SqliteStore(store_path, readonly=False)
    widths = []
    with open(lines_path, "w") as f:
        for i in range(n):
            w = int(rng.choice([100, 300, 700, 900]))
            widths.append(w)
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"l{i:02d}.png"
            store.put(image_id, encode_image(img, ".png"))
            labels = rng.randint(0, 32, size=-(-w // 8)).tolist()
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()
    return store_path, lines_path, widths


def test_bucketed_loader(tmp_path, rng):
    from pero_pretraining_tpu.data.dataset import LinesDataset

    store_path, lines_path, widths = _corpus(tmp_path, rng)
    ds = LinesDataset(store_path, lines_path, max_width=1024)
    loader = BucketedDataLoader(ds, buckets=(512, 1024), batch_size=4, shuffle=True, num_workers=2, seed=0)

    counts = loader.bucket_counts()
    assert counts[512] == sum(1 for w in widths if w <= 512)
    assert counts[1024] == sum(1 for w in widths if w > 512)

    seen_shapes = set()
    total = 0
    for batch in loader:
        seen_shapes.add(batch["images"].shape[2])
        assert batch["images"].shape[2] in (512, 1024)
        # every line's mask fits its bucket
        assert (batch["labels"] >= -1).all()
        total += batch["images"].shape[0]
    assert seen_shapes == {512, 1024}
    assert total == len(loader) * 4


def test_bucketed_training_multiple_shapes(tmp_path, rng):
    """Training across bucket shapes: one compiled program per width."""
    from pero_pretraining_tpu.data.dataset import LinesDataset

    store_path, lines_path, _ = _corpus(tmp_path, rng)
    ds = LinesDataset(store_path, lines_path, max_width=1024)
    loader = BucketedDataLoader(ds, buckets=(512, 1024), batch_size=4, shuffle=True, num_workers=2, seed=0)

    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=2)
    task = MaskedTask(
        BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=1, feedforward_dim=128, max_len=128),
        HeadConfig(in_features=64, out_features=32),
        training,
    )
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    batches = [numeric_batch(b) for b in loader]
    state = trainer.init_state(batches[0])
    for b in batches:
        state, metrics = trainer.train_step(state, b)
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == len(batches)
