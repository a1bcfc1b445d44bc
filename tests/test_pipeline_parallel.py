"""Pipeline parallelism (parallel/pipeline.py + PipelinedEncoderStack).

Beyond-parity extension (the reference is single-device; SURVEY.md §2.7
lists pipeline parallelism as absent). Correctness bar:
- the stacked-blocks layout is numerically IDENTICAL to the per-block loop
  (layout conversion utilities round-trip),
- the GPipe loop on a (data x pipe) mesh reproduces the single-device
  stacked train step exactly (forward, backward, optimizer),
- invalid compositions fail loudly at construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.models.transformer import build_backbone
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.parallel.pipeline import stack_block_params, unstack_block_params
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

BASE = dict(type="vit", model_dim=64, num_heads=2, feedforward_dim=128, max_len=512)
TINY_HEAD = HeadConfig(in_features=64, out_features=50)
TINY_TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0)


def test_stacked_layout_matches_per_block_forward(rng):
    """Converting block0..L-1 params to the stacked layout and running the
    scan-over-layers path reproduces the unstacked forward exactly."""
    x = jnp.asarray(rng.rand(2, 40, 128, 3), jnp.float32)

    cfg_n = BackboneConfig(**BASE, num_blocks=4)
    bb_n = build_backbone(cfg_n)
    params_n = bb_n.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    out_n = bb_n.apply({"params": params_n}, x, train=False)

    cfg_s = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)
    bb_s = build_backbone(cfg_s)
    params_s = dict(bb_s.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"])
    blocks = [params_n[f"block{i}"] for i in range(4)]
    params_s["stack"] = {"blocks": stack_block_params(blocks)}
    for key in params_n:
        if not key.startswith("block"):
            params_s[key] = params_n[key]
    out_s = bb_s.apply({"params": params_s}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_n), rtol=1e-5, atol=1e-6)


def test_stack_unstack_roundtrip(rng):
    blocks = [
        {"w": jnp.asarray(rng.randn(3, 3), jnp.float32), "b": jnp.asarray(rng.randn(3), jnp.float32)}
        for _ in range(4)
    ]
    stacked = stack_block_params(blocks)
    assert stacked["w"].shape == (4, 3, 3)
    back = unstack_block_params(stacked, 4)
    for orig, rec in zip(blocks, back):
        np.testing.assert_array_equal(np.asarray(orig["w"]), np.asarray(rec["w"]))
        np.testing.assert_array_equal(np.asarray(orig["b"]), np.asarray(rec["b"]))


def test_pipeline_train_step_matches_single_device(rng):
    """Full masked train step on a (2 data x 4 pipe) mesh reproduces the
    single-device stacked-layout update exactly."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)
    cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)

    task1 = MaskedTask(cfg, TINY_HEAD, TINY_TRAIN)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, TINY_TRAIN, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    mesh8 = create_mesh(MeshConfig(data=2, pipe=4))
    task8 = MaskedTask(cfg, TINY_HEAD, TINY_TRAIN, mesh=mesh8)
    t8 = Trainer(task8, TINY_TRAIN, mesh=mesh8)
    s8 = t8.init_state(batch)

    # the layer axis of the stacked blocks must be physically sharded
    qkv = s8.params["backbone"]["stack"]["blocks"]["attention"]["qkv"]["kernel"]
    assert qkv.sharding.spec[0] == "pipe", f"pipe axis not sharded: {qkv.sharding.spec}"

    s8, m8 = t8.train_step(s8, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)

    # second step exercises donation + resharding
    s8, m8 = t8.train_step(s8, batch)
    assert np.isfinite(float(m8["loss"]))


def test_pipeline_microbatch_count_is_numerics_neutral(rng):
    """M=2 and M=4 microbatches give the same forward (GPipe splits, it does
    not change math)."""
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)
    images = jnp.asarray(batch["images"], jnp.float32) / 255.0
    mesh = create_mesh(MeshConfig(data=1, pipe=2), devices=jax.devices()[:2])

    outs = []
    for m in (2, 4):
        cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True, pipeline_microbatches=m)
        bb = build_backbone(cfg, mesh=mesh)
        params = bb.init({"params": jax.random.PRNGKey(0)}, images, train=False)["params"]
        outs.append(jax.jit(lambda p, x: bb.apply({"params": p}, x, train=False))(params, images))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]), rtol=1e-5, atol=1e-6)


def test_pipeline_rejects_bad_compositions(rng):
    x = jnp.zeros((2, 40, 128, 3), jnp.float32)

    # blocks not divisible by pipe
    mesh = create_mesh(MeshConfig(data=1, pipe=4), devices=jax.devices()[:4])
    cfg = BackboneConfig(**BASE, num_blocks=6)
    bb = build_backbone(cfg, mesh=mesh)
    with pytest.raises(ValueError, match="not divisible by pipe"):
        bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    # pipe x model is rejected (manual region cannot do GSPMD TP)
    mesh = create_mesh(MeshConfig(data=1, pipe=2, model=2), devices=jax.devices()[:4])
    cfg = BackboneConfig(**BASE, num_blocks=4)
    bb = build_backbone(cfg, mesh=mesh)
    with pytest.raises(ValueError, match="does not compose"):
        bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    # MoE inside the pipelined region is rejected
    mesh = create_mesh(MeshConfig(data=1, pipe=2), devices=jax.devices()[:2])
    cfg = BackboneConfig(**BASE, num_blocks=4, num_experts=2)
    bb = build_backbone(cfg, mesh=mesh)
    with pytest.raises(ValueError, match="MoE"):
        bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)


def test_pipeline_composes_with_zero1_and_grad_accum(rng):
    """PP x DP x ZeRO-1 x microbatch-accumulation in one step still equals
    the single-device stacked update."""
    assert len(jax.devices()) >= 8
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)
    # grad_accum=2 halves each microbatch's local rows (8/2/2 data = 2), so
    # the pipeline microbatch count must divide 2
    cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True, pipeline_microbatches=2)
    train_cfg = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0,
        grad_accum=2, shard_opt_state=True,
    )

    task1 = MaskedTask(cfg, TINY_HEAD, train_cfg)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, train_cfg, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    mesh8 = create_mesh(MeshConfig(data=2, pipe=4))
    task8 = MaskedTask(cfg, TINY_HEAD, train_cfg, mesh=mesh8)
    t8 = Trainer(task8, train_cfg, mesh=mesh8)
    s8 = t8.init_state(batch)
    s8, m8 = t8.train_step(s8, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_convert_block_layout_tool(rng):
    """tools/convert_block_layout: per-block -> stacked params produce the
    same forward through the stacked model, and the round trip is exact."""
    from tools.convert_block_layout import convert_params

    x = jnp.asarray(rng.rand(2, 40, 128, 3), jnp.float32)
    cfg_n = BackboneConfig(**BASE, num_blocks=4)
    bb_n = build_backbone(cfg_n)
    params_n = bb_n.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    out_n = bb_n.apply({"params": params_n}, x, train=False)

    stacked_params = convert_params({"backbone": dict(params_n)}, "stacked")["backbone"]
    cfg_s = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)
    bb_s = build_backbone(cfg_s)
    out_s = bb_s.apply({"params": stacked_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_n), rtol=1e-5, atol=1e-6)

    back = convert_params({"backbone": dict(stacked_params)}, "blocks")["backbone"]
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(params_n), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_pipeline_checkpoint_roundtrip_place_state(rng, tmp_path):
    """Save -> load -> place_state under PP keeps the stacked layout sharded
    over `pipe` and resumes bit-continuously."""
    from pero_pretraining_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    assert len(jax.devices()) >= 8
    cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)
    mesh = create_mesh(MeshConfig(data=2, pipe=4))
    batches = [synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50) for _ in range(3)]

    trainer = Trainer(MaskedTask(cfg, TINY_HEAD, TINY_TRAIN, mesh=mesh), TINY_TRAIN, mesh=mesh)
    state = trainer.init_state(batches[0])
    state, _ = trainer.train_step(state, batches[0])
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(state, path)

    cont = state
    for b in batches[1:]:
        cont, m_cont = trainer.train_step(cont, b)

    trainer2 = Trainer(MaskedTask(cfg, TINY_HEAD, TINY_TRAIN, mesh=mesh), TINY_TRAIN, mesh=mesh)
    template = trainer2.init_state(batches[0])
    resumed = trainer2.place_state(load_checkpoint(template, path))
    qkv = resumed.params["backbone"]["stack"]["blocks"]["attention"]["qkv"]["kernel"]
    assert qkv.sharding.spec[0] == "pipe", "resume lost the pipe partitioning"
    for b in batches[1:]:
        resumed, m_res = trainer2.train_step(resumed, b)

    assert int(resumed.step) == int(cont.step)
    np.testing.assert_allclose(float(m_res["loss"]), float(m_cont["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(cont.params)),
        jax.tree_util.tree_leaves(jax.device_get(resumed.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_pipeline_composes_with_flash_attention(rng):
    """The Pallas flash kernel (interpret on CPU, Mosaic on TPU) runs inside
    the pipeline's shard_map stages and matches the XLA-attention pipeline."""
    x = jnp.asarray(rng.rand(2, 40, 256, 3), jnp.float32)
    mesh = create_mesh(MeshConfig(data=1, pipe=2), devices=jax.devices()[:2])
    cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)

    bb_x = build_backbone(cfg, mesh=mesh, attention_impl="xla")
    params = bb_x.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    out_x = jax.jit(lambda p, x: bb_x.apply({"params": p}, x, train=False))(params, x)

    bb_f = build_backbone(cfg, mesh=mesh, attention_impl="flash")
    out_f = jax.jit(lambda p, x: bb_f.apply({"params": p}, x, train=False))(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=1e-4, atol=1e-5)


def test_pipeline_composes_with_train_many(rng):
    """steps_per_call scan-fusion (train_many) wraps the pipeline shard_map:
    K fused steps equal K sequential steps on the (data x pipe) mesh."""
    cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)
    mesh = create_mesh(MeshConfig(data=2, pipe=4))
    batches = [synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50) for _ in range(3)]

    t_seq = Trainer(MaskedTask(cfg, TINY_HEAD, TINY_TRAIN, mesh=mesh), TINY_TRAIN, mesh=mesh)
    s = t_seq.init_state(batches[0])
    for b in batches:
        s, m_seq = t_seq.train_step(s, b)

    t_fused = Trainer(MaskedTask(cfg, TINY_HEAD, TINY_TRAIN, mesh=mesh), TINY_TRAIN, mesh=mesh)
    s2 = t_fused.init_state(batches[0])
    s2, m_fused = t_fused.train_many(s2, batches)

    np.testing.assert_allclose(float(m_seq["loss"]), float(m_fused["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s.params)),
        jax.tree_util.tree_leaves(jax.device_get(s2.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_stacked_with_tensor_parallel_raises(rng):
    """stacked_blocks + mesh model>1 (pipe=1) must fail loudly: the stacked
    sharding rule (P(pipe) on every block leaf) replaces the per-layer
    MODEL_AXIS specs, so accepting it would silently replicate all encoder
    weights — the user asks for TP and gets none (advisor finding, round 2)."""
    cfg = BackboneConfig(**BASE, num_blocks=4, stacked_blocks=True)
    mesh = create_mesh(MeshConfig(data=4, model=2))
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)
    trainer = Trainer(MaskedTask(cfg, TINY_HEAD, TINY_TRAIN, mesh=mesh), TINY_TRAIN, mesh=mesh)
    with pytest.raises(ValueError, match="tensor parallelism"):
        trainer.init_state(batch)
