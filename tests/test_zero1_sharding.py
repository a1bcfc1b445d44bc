"""ZeRO-1 optimizer-state sharding (--shard-opt-state).

Runs on the 8-virtual-CPU-device mesh (conftest). Verifies, against the plain
replicated-optimizer trainer:

1. the Adam moments are PHYSICALLY partitioned over the `data` axis
   (addressable shards are 1/data_size of the full tensor),
2. training is numerically equivalent — same batches, same seed, params after
   several steps match the unsharded run,
3. checkpoint round-trip through place_state preserves both the partitioning
   and the trajectory.

The reference has no distributed support at all (SURVEY.md §2.7); this is the
TPU-native scaling lever named in docs/PROFILE.md (the fused Adam update runs
at HBM roofline at ~1/3 of the flagship step).
"""

import dataclasses

import numpy as np
import pytest

import jax

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=256)
HEAD = HeadConfig(in_features=64, out_features=128)


def _make(shard_opt_state, mesh, **kw):
    training = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.2, seed=0,
        shard_opt_state=shard_opt_state, **kw,
    )
    task = MaskedTask(BACKBONE, HEAD, training)
    return Trainer(task, training, mesh=mesh)


def _batches(n, batch_size=8):
    rng = np.random.RandomState(7)
    return [synthetic_masked_batch(rng, batch_size=batch_size, width=256, num_labels=128) for _ in range(n)]


def _mu_leaves(opt_state):
    # find the ScaleByAdamState mu tree among optax wrapper states
    found = []

    def visit(node):
        if hasattr(node, "mu"):
            found.append(node.mu)
        if hasattr(node, "inner_state"):
            visit(node.inner_state)
        elif isinstance(node, (tuple, list)):
            for child in node:
                visit(child)

    visit(opt_state)
    assert found, "no Adam moment state found"
    return jax.tree_util.tree_leaves(found[0])


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_zero1_moments_physically_sharded(mesh_shape):
    data, model = mesh_shape
    mesh = create_mesh(MeshConfig(data=data, model=model), devices=jax.devices()[: data * model])
    trainer = _make(True, mesh)
    state = trainer.init_state(_batches(1)[0])

    # every matrix-shaped moment must be partitioned over `data` (all dims of
    # the test model are divisible by data=8 or 4)
    matrices = [l for l in _mu_leaves(state.opt_state) if l.ndim >= 2]
    assert matrices
    for leaf in matrices:
        assert DATA_AXIS in tuple(leaf.sharding.spec), (leaf.shape, leaf.sharding.spec)
        assert leaf.addressable_shards[0].data.size <= leaf.size // data

    # one step keeps the partitioning (with_sharding_constraint in _step)
    state, metrics = trainer.train_step(state, _batches(1)[0])
    assert np.isfinite(float(metrics["loss"]))
    big = [l for l in _mu_leaves(state.opt_state) if l.ndim >= 2]
    for leaf in big:
        assert leaf.addressable_shards[0].data.size < leaf.size, "moment replicated after step"


def test_zero1_matches_replicated_run():
    mesh = create_mesh(MeshConfig(data=4, model=2), devices=jax.devices()[:8])
    batches = _batches(4)

    results = {}
    for flag in (False, True):
        trainer = _make(flag, mesh)
        state = trainer.init_state(batches[0])
        for b in batches:
            state, metrics = trainer.train_step(state, b)
        results[flag] = (jax.device_get(state.params), float(metrics["loss"]))

    ref, zero1 = results[False], results[True]
    assert np.isclose(ref[1], zero1[1], rtol=1e-5), (ref[1], zero1[1])
    flat_ref = jax.tree_util.tree_leaves(ref[0])
    flat_z = jax.tree_util.tree_leaves(zero1[0])
    for a, b in zip(flat_ref, flat_z):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_zero1_checkpoint_roundtrip_place_state(tmp_path):
    from pero_pretraining_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    mesh = create_mesh(MeshConfig(data=8, model=1), devices=jax.devices()[:8])
    batches = _batches(3)

    trainer = _make(True, mesh)
    state = trainer.init_state(batches[0])
    state, _ = trainer.train_step(state, batches[0])
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(state, path)

    # continue the original
    cont = state
    for b in batches[1:]:
        cont, m_cont = trainer.train_step(cont, b)

    # resume: fresh trainer, template from init, load + place
    trainer2 = _make(True, mesh)
    template = trainer2.init_state(batches[0])
    resumed = trainer2.place_state(load_checkpoint(template, path))
    for leaf in _mu_leaves(resumed.opt_state):
        if leaf.ndim >= 2:
            assert leaf.addressable_shards[0].data.size < leaf.size, "resume lost the partitioning"
    for b in batches[1:]:
        resumed, m_res = trainer2.train_step(resumed, b)

    assert int(resumed.step) == int(cont.step)
    np.testing.assert_allclose(float(m_res["loss"]), float(m_cont["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(cont.params)),
                    jax.tree_util.tree_leaves(jax.device_get(resumed.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_zero1_composes_with_bf16_moments_and_accum():
    mesh = create_mesh(MeshConfig(data=4, model=2), devices=jax.devices()[:8])
    trainer = _make(True, mesh, moments_dtype="bfloat16", grad_accum=2)
    batch = _batches(1)[0]
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    big = [l for l in _mu_leaves(state.opt_state) if l.ndim >= 2]
    assert big and all(l.addressable_shards[0].data.size < l.size for l in big)
    assert all(str(l.dtype) == "bfloat16" for l in big)
