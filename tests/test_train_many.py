"""Scan-fused multi-step training must be numerically identical to the
single-step loop (same batches, same fold_in(step) randomness)."""

import jax
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

TINY = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=64)
TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=4, seed=0)


def test_train_many_matches_single_steps(rng):
    batches = [synthetic_masked_batch(rng, batch_size=4, width=128, num_labels=32) for _ in range(4)]
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])

    t1 = Trainer(MaskedTask(TINY, HeadConfig(in_features=64, out_features=32), TRAIN), TRAIN, mesh=mesh)
    s1 = t1.init_state(batches[0])
    for b in batches:
        s1, m1 = t1.train_step(s1, b)

    t2 = Trainer(MaskedTask(TINY, HeadConfig(in_features=64, out_features=32), TRAIN), TRAIN, mesh=mesh)
    s2 = t2.init_state(batches[0])
    s2, m2 = t2.train_many(s2, batches)

    assert int(s1.step) == int(s2.step) == 4
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s2.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fit_with_steps_per_call(rng):
    batches = [synthetic_masked_batch(rng, batch_size=4, width=128, num_labels=32) for _ in range(4)]
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(MaskedTask(TINY, HeadConfig(in_features=64, out_features=32), TRAIN), TRAIN, mesh=mesh)
    state = trainer.init_state(batches[0])

    seen = []
    trainer.on_view_step = lambda it, st, el, cnt, m: seen.append((it, cnt))
    state = trainer.fit(state, batches, start_iteration=0, end_iteration=8, view_step=4, steps_per_call=2)
    assert int(state.step) == 8
    assert seen == [(4, 4), (8, 4)]
