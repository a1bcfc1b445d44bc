"""End-to-end smoke tests: masked pretraining on synthetic data, single- and
multi-device (8 virtual CPU devices), checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from pero_pretraining_tpu.training.trainer import Trainer

TINY_BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=512)
TINY_HEAD = HeadConfig(in_features=64, out_features=50)
TINY_TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0)


def _batches(rng, n, **kw):
    return [synthetic_masked_batch(rng, **kw) for _ in range(n)]


def make_task():
    return MaskedTask(TINY_BACKBONE, TINY_HEAD, TINY_TRAIN)


def test_train_step_runs_and_loss_decreases(rng):
    task = make_task()
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)

    batches = _batches(rng, 1, batch_size=4, width=256, num_labels=50)
    state = trainer.init_state(batches[0])

    first_loss = None
    for i in range(30):
        state, metrics = trainer.train_step(state, batches[0])
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(first_loss) and np.isfinite(last_loss)
    assert last_loss < first_loss  # same batch repeated must overfit


def test_multichip_data_parallel(rng):
    """Full train step jitted over an 8-device (4 data x 2 model) mesh."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    task = make_task()
    mesh = create_mesh(MeshConfig(data=4, model=2))
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)

    batches = _batches(rng, 2, batch_size=8, width=256, num_labels=50)
    state = trainer.init_state(batches[0])

    # tensor-parallel params must actually shard over the model axis
    qkv = state.params["backbone"]["block0"]["attention"]["qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert "model" in str(spec), f"qkv kernel not model-sharded: {spec}"
    head_kernel = state.params["head"]["linear"]["kernel"]
    assert "model" in str(head_kernel.sharding.spec)
    # and each shard holds only 1/model_par of the output dim
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2

    state, metrics = trainer.train_step(state, batches[0])
    state, metrics = trainer.train_step(state, batches[1])
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_dp_matches_single_device(rng):
    """Data-parallel gradients (psum over the mesh) must reproduce the
    single-device update bit-for-bit up to float tolerance."""
    batches = _batches(rng, 1, batch_size=8, width=256, num_labels=50)

    task1 = make_task()
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, TINY_TRAIN, mesh=mesh1)
    s1 = t1.init_state(batches[0])
    s1, m1 = t1.train_step(s1, batches[0])

    task8 = make_task()
    mesh8 = create_mesh(MeshConfig(data=8, model=1))
    t8 = Trainer(task8, TINY_TRAIN, mesh=mesh8)
    s8 = t8.init_state(batches[0])
    s8, m8 = t8.train_step(s8, batches[0])

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    p1 = jax.device_get(s1.params)
    p8 = jax.device_get(s8.params)
    for l1, l8 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(rng, tmp_path):
    task = make_task()
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
    batches = _batches(rng, 1, batch_size=4, width=256, num_labels=50)
    state = trainer.init_state(batches[0])
    state, _ = trainer.train_step(state, batches[0])

    path = str(tmp_path / "checkpoint_000001.msgpack")
    save_checkpoint(state, path)

    template = trainer.init_state(batches[0])
    restored = load_checkpoint(template, path)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(a, b)

    # resumed training must continue deterministically vs uninterrupted run
    state_cont, m_cont = trainer.train_step(restored, batches[0])
    state_ref, m_ref = trainer.train_step(state, batches[0])
    np.testing.assert_allclose(float(m_cont["loss"]), float(m_ref["loss"]), rtol=1e-6)


def test_eval_step_topk(rng):
    task = make_task()
    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    variables = task.init_variables(jax.random.PRNGKey(0), batch)
    variables = dict(variables)
    params = variables.pop("params")
    loss, counts = task.eval_step(params, variables, batch, jax.random.PRNGKey(1))
    length = int(counts["length"])
    assert length > 0
    e1, e3, e10 = (int(counts[f"errors_{k}"]) for k in (1, 3, 10))
    assert e10 <= e3 <= e1 <= length
