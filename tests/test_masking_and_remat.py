"""Span masking and rematerialization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig
from pero_pretraining_tpu.models.transformer import VisionTransformerEncoder
from pero_pretraining_tpu.ops.masking import sample_span_mask


def test_span_mask_structure():
    labels = jnp.zeros((8, 256), dtype=jnp.int32)  # all real content
    mask = np.asarray(sample_span_mask(jax.random.PRNGKey(0), labels, masking_prob=0.3, span_length=4))
    rate = mask.mean()
    assert 0.15 < rate < 0.45, f"coverage {rate} far from target 0.3"

    # masked frames must form runs: count isolated single-frame maskings —
    # with span length 4 the overwhelming majority of masked frames have a
    # masked neighbor
    padded = np.pad(mask, ((0, 0), (1, 1)))
    isolated = (padded[:, 1:-1] == 1) & (padded[:, :-2] == 0) & (padded[:, 2:] == 0)
    assert isolated.sum() / max(mask.sum(), 1) < 0.2

    # respects content boundaries
    labels2 = jnp.full((4, 64), -1, dtype=jnp.int32)
    mask2 = np.asarray(sample_span_mask(jax.random.PRNGKey(1), labels2, 0.5, 3))
    assert mask2.sum() == 0


def test_remat_matches_non_remat(rng):
    x = jnp.asarray(rng.rand(2, 40, 128, 3).astype(np.float32))
    base = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, random_shift=False)

    m1 = VisionTransformerEncoder(base)
    m2 = VisionTransformerEncoder(BackboneConfig(**{**base.__dict__, "remat": True}))
    variables = m1.init(jax.random.PRNGKey(0), x, train=False)

    y1 = m1.apply(variables, x, train=False)
    y2 = m2.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6, atol=1e-6)

    g1 = jax.grad(lambda v: jnp.sum(m1.apply(v, x, train=False) ** 2))(variables)
    g2 = jax.grad(lambda v: jnp.sum(m2.apply(v, x, train=False) ** 2))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_fit_profile_dir_captures_trace(rng, tmp_path):
    """--profile-dir: fit() writes a Perfetto/TensorBoard trace directory."""
    import os

    import jax
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    task = MaskedTask(
        BackboneConfig(type="vit", model_dim=32, num_heads=2, num_blocks=1, feedforward_dim=64, max_len=64),
        HeadConfig(in_features=32, out_features=16),
        TrainingConfig(seed=0, view_step=0),
    )
    batch = numeric_batch(synthetic_masked_batch(rng, batch_size=2, width=128, num_labels=16))
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, task.training_config, mesh=mesh)
    state = trainer.init_state(batch)

    trace_dir = str(tmp_path / "trace")
    trainer.fit(state, iter(lambda: batch, None), start_iteration=0, end_iteration=6,
                view_step=0, profile_dir=trace_dir, profile_start=2, profile_steps=2)
    files = [os.path.join(r, f) for r, _, fs in os.walk(trace_dir) for f in fs]
    assert files, "no trace files written"
