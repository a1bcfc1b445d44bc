"""ZeRO-3 / FSDP parameter sharding (parallel/sharding.py::fsdp_param_shardings).

Beyond-parity extension (the reference is single-device, SURVEY.md §2.7).
FSDP is pure sharding annotations — GSPMD inserts the just-in-time weight
all-gathers and gradient reduce-scatters — so the correctness bar is exact
equality with replicated-parameter training.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

TINY_BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=512)
TINY_HEAD = HeadConfig(in_features=64, out_features=64)


def test_fsdp_train_step_matches_replicated(rng):
    """FSDP over data=8 reproduces the replicated-params update exactly, and
    the large kernels are physically sharded over `data`."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=64)

    base = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0)
    task1 = MaskedTask(TINY_BACKBONE, TINY_HEAD, base)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, base, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    fsdp_cfg = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0, fsdp=True
    )
    mesh8 = create_mesh(MeshConfig(data=8))
    task8 = MaskedTask(TINY_BACKBONE, TINY_HEAD, fsdp_cfg)
    t8 = Trainer(task8, fsdp_cfg, mesh=mesh8)
    s8 = t8.init_state(batch)

    # a large kernel must be physically sharded over `data`
    fc1 = s8.params["backbone"]["block0"]["mlp"]["fc1"]["kernel"]
    assert "data" in tuple(fc1.sharding.spec), f"fc1 not data-sharded: {fc1.sharding.spec}"
    shard_bytes = fc1.addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == fc1.nbytes, "per-chip residency did not divide by 8"

    # ... and so must the Adam moments AT INIT (GSPMD propagation through
    # jit(tx.init) is not guaranteed; init_state pins moments to their
    # param's placement explicitly — the 234M memory bench measured
    # replicated-moment init costing 1.86 vs 0.33 GiB/device). Moment dtype
    # follows --moments-dtype (bf16 is the default since round 4), so filter
    # on floating moments of any storage precision, not fp32 only.
    moment_matrices = [
        l for l in jax.tree_util.tree_leaves(s8.opt_state)
        if getattr(l, "ndim", 0) >= 2 and l.dtype in (jnp.float32, jnp.bfloat16)
        and len(l.addressable_shards) and l.addressable_shards[0].data.size < l.size
    ]
    assert moment_matrices, "no Adam moment was physically partitioned at FSDP init"

    s8, m8 = t8.train_step(s8, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)

    # second step exercises donation with the sharded layout
    s8, m8 = t8.train_step(s8, batch)
    assert np.isfinite(float(m8["loss"]))


def test_fsdp_composes_with_tp_and_zero1(rng):
    """FSDP + tensor parallel + ZeRO-1 on a (4 data x 2 model) mesh still
    equals the single-device update; model-sharded dims stay on `model`."""
    assert len(jax.devices()) >= 8
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=64)

    base = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0)
    task1 = MaskedTask(TINY_BACKBONE, TINY_HEAD, base)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, base, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0,
        fsdp=True, shard_opt_state=True,
    )
    mesh8 = create_mesh(MeshConfig(data=4, model=2))
    task8 = MaskedTask(TINY_BACKBONE, TINY_HEAD, cfg)
    t8 = Trainer(task8, cfg, mesh=mesh8)
    s8 = t8.init_state(batch)

    fc1 = s8.params["backbone"]["block0"]["mlp"]["fc1"]["kernel"]
    spec = tuple(fc1.sharding.spec)
    assert "model" in spec and "data" in spec, f"expected data+model sharding, got {spec}"

    s8, m8 = t8.train_step(s8, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_fsdp_checkpoint_roundtrip_place_state(rng, tmp_path):
    """Save -> load -> place_state under FSDP keeps the sharded layout and
    resumes bit-continuously (same losses/params as the uninterrupted run)."""
    from pero_pretraining_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    assert len(jax.devices()) >= 8
    cfg = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0, fsdp=True)
    mesh = create_mesh(MeshConfig(data=8))
    batches = [synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=64) for _ in range(3)]

    trainer = Trainer(MaskedTask(TINY_BACKBONE, TINY_HEAD, cfg), cfg, mesh=mesh)
    state = trainer.init_state(batches[0])
    state, _ = trainer.train_step(state, batches[0])
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(state, path)

    cont = state
    for b in batches[1:]:
        cont, m_cont = trainer.train_step(cont, b)

    trainer2 = Trainer(MaskedTask(TINY_BACKBONE, TINY_HEAD, cfg), cfg, mesh=mesh)
    template = trainer2.init_state(batches[0])
    resumed = trainer2.place_state(load_checkpoint(template, path))
    fc1 = resumed.params["backbone"]["block0"]["mlp"]["fc1"]["kernel"]
    assert fc1.addressable_shards[0].data.size < fc1.size, "resume lost the FSDP partitioning"
    for b in batches[1:]:
        resumed, m_res = trainer2.train_step(resumed, b)

    assert int(resumed.step) == int(cont.step)
    np.testing.assert_allclose(float(m_res["loss"]), float(m_cont["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(cont.params)),
        jax.tree_util.tree_leaves(jax.device_get(resumed.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_fsdp_resume_keeps_opt_state_sharded(rng, tmp_path):
    """place_state without --shard-opt-state must re-place the loaded Adam
    moments with the FSDP param layout, not replicated() — replicating them
    materializes full-size moments per chip, exactly the memory FSDP shards
    away, and only on RESUME (advisor finding, round 2: a fresh run inherits
    the sharded layout through jit(tx.init))."""
    from pero_pretraining_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    assert len(jax.devices()) >= 8
    cfg = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0, fsdp=True)
    mesh = create_mesh(MeshConfig(data=8))
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=64)

    trainer = Trainer(MaskedTask(TINY_BACKBONE, TINY_HEAD, cfg), cfg, mesh=mesh)
    state = trainer.init_state(batch)
    state, _ = trainer.train_step(state, batch)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(state, path)

    trainer2 = Trainer(MaskedTask(TINY_BACKBONE, TINY_HEAD, cfg), cfg, mesh=mesh)
    template = trainer2.init_state(batch)
    resumed = trainer2.place_state(load_checkpoint(template, path))

    # find the fc1 kernel's mu moment and assert it is physically sharded
    # (the 1-D bias keeps its rule spec and has no free dim to shard)
    def moment_leaves(tree):
        return [
            (jax.tree_util.keystr(path), leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
            if "mu" in jax.tree_util.keystr(path)
            and "fc1" in jax.tree_util.keystr(path)
            and "kernel" in jax.tree_util.keystr(path)
        ]

    found = moment_leaves(resumed.opt_state)
    assert found, "no fc1 mu moment found in opt_state"
    for name, leaf in found:
        assert leaf.addressable_shards[0].data.size < leaf.size, (
            f"resumed moment {name} is fully replicated — FSDP resume would OOM "
            f"where a fresh run does not (sharding: {leaf.sharding})"
        )

    # and the resumed run still steps with finite loss under donation
    resumed, m = trainer2.train_step(resumed, batch)
    assert np.isfinite(float(m["loss"]))
