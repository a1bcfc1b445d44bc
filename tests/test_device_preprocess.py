"""Fused on-device preprocessing (shift augmentation) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.ops.preprocess import device_shift_augment
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer


def _left_aligned_batch(rng, n=6, width=256):
    items = []
    for _ in range(n):
        w = int(rng.randint(64, width))
        items.append(
            {
                "image": rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8),
                "image2": None,
                "labels": rng.randint(0, 50, size=-(-w // 8)).tolist(),
                "image_id": "x",
            }
        )
    creator = BatchCreator(pad_to=width, seed=0, left_align=True)
    return creator.create_batch(items), items


def test_left_align_collation(rng):
    batch, items = _left_aligned_batch(rng)
    assert "widths" in batch
    for i, item in enumerate(items):
        w = item["image"].shape[1]
        frames = -(-w // 8)
        assert batch["widths"][i] == frames
        np.testing.assert_array_equal(batch["images"][i, :, :w], item["image"])  # at offset 0
        assert batch["image_masks"][i, :frames].all()
        assert (batch["labels"][i, :frames] >= 0).all()


def test_device_shift_preserves_content(rng):
    batch, items = _left_aligned_batch(rng)
    images, labels, masks = device_shift_augment(
        jax.random.PRNGKey(3),
        jnp.asarray(batch["images"]),
        jnp.asarray(batch["widths"]),
        jnp.asarray(batch["labels"]),
    )
    images, labels, masks = np.asarray(images), np.asarray(labels), np.asarray(masks)

    for i, item in enumerate(items):
        frames = int(batch["widths"][i])
        lp_candidates = np.nonzero(masks[i])[0]
        assert len(lp_candidates) == frames, "mask frame count must equal content width"
        lp = lp_candidates[0]
        # contiguous mask
        np.testing.assert_array_equal(lp_candidates, np.arange(lp, lp + frames))
        # rolled image content matches the original at the new offset
        w = item["image"].shape[1]
        np.testing.assert_array_equal(images[i, :, lp * 8 : lp * 8 + w], item["image"])
        # labels rolled consistently, -1 outside
        np.testing.assert_array_equal(labels[i, lp : lp + frames], batch["labels"][i, :frames])
        assert (labels[i, :lp] == -1).all() and (labels[i, lp + frames :] == -1).all()


def test_device_shift_randomizes_over_steps(rng):
    batch, _ = _left_aligned_batch(rng, n=4, width=512)
    offsets = set()
    for seed in range(8):
        _, _, masks = device_shift_augment(
            jax.random.PRNGKey(seed), jnp.asarray(batch["images"]), jnp.asarray(batch["widths"])
        )
        offsets.add(int(np.argmax(np.asarray(masks)[0])))
    assert len(offsets) > 2, "left paddings must vary across steps"


def test_masked_training_with_device_augment(rng):
    batch, _ = _left_aligned_batch(rng, n=4, width=256)
    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, device_augment=True)
    task = MaskedTask(
        BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=256),
        HeadConfig(in_features=64, out_features=50),
        training,
    )
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    from pero_pretraining_tpu.training.tester import numeric_batch

    nb = numeric_batch(batch)
    state = trainer.init_state(batch)
    losses = []
    for _ in range(25):
        state, metrics = trainer.train_step(state, nb)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
