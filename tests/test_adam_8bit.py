"""Blockwise 8-bit Adam moments (--moments-dtype int8).

The flagship trace (docs/PROFILE.md) puts the fused Adam update at the HBM
roofline; 8-bit moment storage is the byte floor after bf16. Verifies:

1. quantize/decode round-trip error is bounded by the per-block resolution,
2. step 1 is bit-equal to fp32 Adam (updates are computed from fresh fp32
   moments; quantization applies only to what is stored),
3. steady-state: a 200-step quadratic descent tracks fp32 Adam closely,
4. the real Trainer runs with moments_dtype="int8" (loss decreases, state
   checkpoints round-trip, moments really are 1-byte),
5. ZeRO-1 composition: the param-shaped int8 moment leaves partition over
   `data` via the existing path-suffix match (parallel/sharding.py).

The reference has a single fp32-Adam GPU path (masked_pretraining/train.py:146);
this is a TPU-native extension (bandwidth roofline lever), not a port.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import (
    Trainer,
    _q8_decode,
    _q8_encode,
    scale_by_adam_8bit,
)

BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=256)
HEAD = HeadConfig(in_features=64, out_features=128)


def test_q8_roundtrip_error_bound(rng):
    for shape, unsigned in [((512,), False), ((8, 384), False), ((5, 256), True), ((7,), False)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        if unsigned:
            x = jnp.abs(x)
        q, s = _q8_encode(x, unsigned)
        back = _q8_decode(q, s, unsigned)
        # error per element <= half a quantization step of its block
        levels = 255.0 if unsigned else 127.0
        bound = np.asarray(s).max() / levels * 0.5 + 1e-7
        assert np.max(np.abs(np.asarray(back - x))) <= bound * 1.01


def test_q8_zero_block_exact():
    x = jnp.zeros((4, 256))
    q, s = _q8_encode(x, False)
    assert np.all(np.asarray(_q8_decode(q, s, False)) == 0.0)


def test_first_step_matches_fp32_adam(rng):
    params = {"w": jnp.asarray(rng.randn(16, 256).astype(np.float32)),
              "b": jnp.asarray(rng.randn(256).astype(np.float32))}
    grads = jax.tree_util.tree_map(lambda p: jnp.asarray(np.sign(np.asarray(p))) * 0.1, params)
    t8 = scale_by_adam_8bit()
    tf = optax.scale_by_adam()
    u8, _ = t8.update(grads, t8.init(params))
    uf, _ = tf.update(grads, tf.init(params))
    for a, b in zip(jax.tree_util.tree_leaves(u8), jax.tree_util.tree_leaves(uf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_quadratic_descent_tracks_fp32(rng):
    # minimize ||x - target||^2 over 200 steps; 8-bit Adam must land at the
    # same optimum neighborhood as fp32 Adam
    target = jnp.asarray(rng.randn(512).astype(np.float32))

    def loss(x):
        return jnp.sum(jnp.square(x - target))

    def run(tx):
        x = jnp.zeros(512)
        state = tx.init(x)

        @jax.jit
        def step(x, state):
            g = jax.grad(loss)(x)
            upd, state = tx.update(g, state)
            return x + upd, state

        for _ in range(200):
            x, state = step(x, state)
        return float(loss(x))

    lf = run(optax.chain(optax.scale_by_adam(), optax.scale(-0.05)))
    l8 = run(optax.chain(scale_by_adam_8bit(), optax.scale(-0.05)))
    assert l8 < lf * 1.2 + 1e-3, (l8, lf)


def _make_trainer(**kw):
    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.2,
                              seed=0, moments_dtype="int8", **kw)
    task = MaskedTask(BACKBONE, HEAD, training)
    return Trainer(task, training)


def test_trainer_int8_moments_train_and_resume(rng):
    trainer = _make_trainer()
    batches = [synthetic_masked_batch(np.random.RandomState(7), batch_size=8, width=256, num_labels=128)
               for _ in range(6)]
    state = trainer.init_state(batches[0])

    # the stored moments really are 1-byte
    q_dtypes = {np.dtype(l.dtype) for l in jax.tree_util.tree_leaves(state.opt_state)
                if getattr(l, "dtype", None) in (jnp.int8.dtype, jnp.uint8.dtype)}
    assert q_dtypes == {np.dtype(np.int8), np.dtype(np.uint8)}

    # int8-moments training must track the fp32-moments trajectory closely
    # (the update direction is computed from fresh fp32 moments; only storage
    # is quantized — per-step direction error is O(0.5%))
    ref_training = dataclasses.replace(trainer.config, moments_dtype="float32")
    ref_trainer = Trainer(MaskedTask(BACKBONE, HEAD, ref_training), ref_training)
    ref_state = ref_trainer.init_state(batches[0])
    losses, ref_losses = [], []
    for b in batches:
        state, metrics = trainer.train_step(state, b)
        ref_state, ref_metrics = ref_trainer.train_step(ref_state, b)
        losses.append(float(metrics["loss"]))
        ref_losses.append(float(ref_metrics["loss"]))
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-2)

    # checkpoint round-trip: host -> place_state -> continue training
    host = jax.device_get(state)
    placed = trainer.place_state(host)
    cont, _ = trainer.train_step(placed, batches[0])
    ref, _ = trainer.train_step(state, batches[0])
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(cont.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(ref.params)[0]), rtol=1e-6)


def test_zero1_shards_int8_moments():
    from pero_pretraining_tpu.configs import MeshConfig
    from pero_pretraining_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = create_mesh(MeshConfig(data=4), devices=jax.devices()[:4])
    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.2,
                              seed=0, moments_dtype="int8", shard_opt_state=True)
    task = MaskedTask(BACKBONE, HEAD, training)
    trainer = Trainer(task, training, mesh=mesh)
    batch = synthetic_masked_batch(np.random.RandomState(7), batch_size=8, width=256, num_labels=128)
    state = trainer.init_state(batch)

    # at least one int8 moment leaf is physically partitioned over `data`
    partitioned = [
        l for l in jax.tree_util.tree_leaves(state.opt_state)
        if getattr(l, "dtype", None) == jnp.int8.dtype and l.ndim >= 1
        and len(l.addressable_shards) and l.addressable_shards[0].data.size < l.size
    ]
    assert partitioned, "no int8 moment leaf was partitioned over the data axis"

    # and the sharded step equals the single-device step
    single = _make_trainer(shard_opt_state=False)
    s_state = single.init_state(batch)
    s1, _ = trainer.train_step(state, batch)
    s2, _ = single.train_step(s_state, batch)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_fsdp_composes_with_int8_moments():
    """FSDP + int8 moments is the production memory combo: param-sharded
    layout must carry over to the int8 moment leaves (they keep the param's
    shape, so jit(tx.init) gives them the FSDP placement), and the step must
    equal single-device training."""
    from pero_pretraining_tpu.configs import MeshConfig
    from pero_pretraining_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = create_mesh(MeshConfig(data=4), devices=jax.devices()[:4])
    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.2,
                              seed=0, moments_dtype="int8", fsdp=True)
    task = MaskedTask(BACKBONE, HEAD, training)
    trainer = Trainer(task, training, mesh=mesh)
    batch = synthetic_masked_batch(np.random.RandomState(7), batch_size=8, width=256, num_labels=128)
    state = trainer.init_state(batch)

    partitioned = [
        l for l in jax.tree_util.tree_leaves(state.opt_state)
        if getattr(l, "dtype", None) == jnp.int8.dtype and l.ndim >= 1
        and len(l.addressable_shards) and l.addressable_shards[0].data.size < l.size
    ]
    assert partitioned, "FSDP did not partition the int8 moment leaves"

    single = _make_trainer()
    s_state = single.init_state(batch)
    s1, _ = trainer.train_step(state, batch)
    s2, _ = single.train_step(s_state, batch)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)

    # FSDP resume: place_state must keep the int8 moments partitioned
    host = jax.device_get(s1)
    placed = trainer.place_state(host)
    still = [
        l for l in jax.tree_util.tree_leaves(placed.opt_state)
        if getattr(l, "dtype", None) == jnp.int8.dtype and l.ndim >= 1
        and len(l.addressable_shards) and l.addressable_shards[0].data.size < l.size
    ]
    assert still, "place_state replicated the int8 moments on FSDP resume"
