"""Preemption-safe training (Trainer.fit on_preempt).

SIGTERM/SIGINT mid-run must finish the in-flight step, write a consistent
checkpoint at the current iteration, and return — and `--start-iteration -1`
must resume from it exactly. The reference loses everything since the last
view step on preemption (SURVEY.md §5: no failure story).
"""

import os
import signal

import jax
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

TINY_BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=512)
TINY_HEAD = HeadConfig(in_features=64, out_features=50)


def _make_trainer(saves):
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0,
        end_iteration=100, view_step=50,
    )
    task = MaskedTask(TINY_BACKBONE, TINY_HEAD, cfg)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, cfg, mesh=mesh)
    return trainer


def test_sigterm_checkpoints_and_stops(rng, tmp_path):
    from pero_pretraining_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    saves = []

    trainer = _make_trainer(saves)
    state = trainer.init_state(batch)

    def batches():
        step = 0
        while True:
            step += 1
            if step == 4:  # delivered to the main thread; flag checked post-step
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch

    def on_preempt(iteration, st):
        path = str(tmp_path / f"ckpt_{iteration:06d}.msgpack")
        save_checkpoint(st, path)
        saves.append((iteration, path))

    old = signal.getsignal(signal.SIGTERM)
    final = trainer.fit(state, batches(), start_iteration=0, end_iteration=100, view_step=50,
                        on_preempt=on_preempt)
    # fit restored the original handler and stopped early at the signal step
    assert signal.getsignal(signal.SIGTERM) is old
    assert len(saves) == 1
    it, path = saves[0]
    assert it == 4 and int(final.step) == 4
    assert os.path.exists(path)

    # resume from the preemption checkpoint == uninterrupted training
    trainer2 = _make_trainer([])
    template = trainer2.init_state(batch)
    resumed = trainer2.place_state(load_checkpoint(template, path))
    resumed = trainer2.fit(resumed, iter([batch] * 10), start_iteration=4, end_iteration=8)

    trainer3 = _make_trainer([])
    straight = trainer3.init_state(batch)
    straight = trainer3.fit(straight, iter([batch] * 10), start_iteration=0, end_iteration=8)

    assert int(resumed.step) == int(straight.step) == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(resumed.params)),
        jax.tree_util.tree_leaves(jax.device_get(straight.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_no_handler_without_on_preempt(rng):
    """fit without on_preempt must not touch signal handlers."""
    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    trainer = _make_trainer([])
    state = trainer.init_state(batch)
    old_term = signal.getsignal(signal.SIGTERM)
    trainer.fit(state, iter([batch] * 3), start_iteration=0, end_iteration=2)
    assert signal.getsignal(signal.SIGTERM) is old_term
