"""AsyncCheckpointer, retention pruning, and --start-iteration -1 auto-resume."""

import os

import jax
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.cli_common import resolve_start_iteration
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.checkpoint import (
    AsyncCheckpointer,
    find_latest_checkpoint,
    get_checkpoint_path,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from pero_pretraining_tpu.training.trainer import Trainer

TINY = BackboneConfig(type="vit", model_dim=32, num_heads=2, num_blocks=1, feedforward_dim=64, max_len=64)


def _tiny_state(rng):
    task = MaskedTask(TINY, HeadConfig(in_features=32, out_features=16), TrainingConfig(seed=0))
    batch = synthetic_masked_batch(rng, batch_size=2, width=128, num_labels=16)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, task.training_config, mesh=mesh)
    return trainer.init_state(batch)


def test_async_checkpoint_roundtrip(rng, tmp_path):
    state = _tiny_state(rng)
    sync_path = str(tmp_path / "sync.msgpack")
    async_path = str(tmp_path / "async.msgpack")
    save_checkpoint(state, sync_path)

    ckpt = AsyncCheckpointer()
    ckpt.save(state, async_path)
    ckpt.close()

    with open(sync_path, "rb") as a, open(async_path, "rb") as b:
        assert a.read() == b.read()
    restored = load_checkpoint(state, async_path)
    for x, y in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_retention_and_latest(rng, tmp_path):
    state = _tiny_state(rng)
    d = str(tmp_path / "ckpt")
    ckpt = AsyncCheckpointer(keep_last=2)
    for it in (100, 200, 300):
        ckpt.save(state, get_checkpoint_path(d, it))
    ckpt.close()

    remaining = sorted(os.listdir(d))
    assert remaining == ["checkpoint_000200.msgpack", "checkpoint_000300.msgpack"]
    path, iteration = find_latest_checkpoint(d)
    assert iteration == 300 and path.endswith("checkpoint_000300.msgpack")

    prune_checkpoints(d, 1)
    assert sorted(os.listdir(d)) == ["checkpoint_000300.msgpack"]


def test_resolve_start_iteration(rng, tmp_path):
    d = str(tmp_path / "ckpt")
    assert resolve_start_iteration(5, d) == 5
    assert resolve_start_iteration(-1, None) == 0
    assert resolve_start_iteration(-1, d) == 0  # dir doesn't exist yet

    state = _tiny_state(rng)
    save_checkpoint(state, get_checkpoint_path(d, 42))
    assert resolve_start_iteration(-1, d) == 42
