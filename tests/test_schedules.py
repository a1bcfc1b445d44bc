"""Warmup schedule parity with the reference formula
(common/lr_scheduler.py:14-24): lr(i) = (i / warmup)^order * base for
i <= warmup, then base; warmup <= 0 means constant."""

import numpy as np
import pytest

from pero_pretraining_tpu.configs import TrainingConfig
from pero_pretraining_tpu.training.schedules import (
    build_schedule,
    warmup_cosine_schedule,
    warmup_polynomial_schedule,
)


def test_linear_warmup_values():
    sched = warmup_polynomial_schedule(2e-4, 10000, 1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5000)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10000)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50000)), 2e-4, rtol=1e-6)


def test_polynomial_order():
    sched = warmup_polynomial_schedule(1.0, 100, 2)
    np.testing.assert_allclose(float(sched(50)), 0.25, rtol=1e-6)


def test_no_warmup_constant():
    sched = warmup_polynomial_schedule(3e-4, 0, 1)
    for step in (0, 1, 1000):
        np.testing.assert_allclose(float(sched(step)), 3e-4, rtol=1e-6)


def test_cosine_schedule_shape():
    sched = warmup_cosine_schedule(1e-3, 100, 1100, 1, min_lr_fraction=0.1)
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-6)  # mid-warmup
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-6)  # peak
    np.testing.assert_allclose(float(sched(600)), 1e-3 * (0.1 + 0.9 * 0.5), rtol=1e-5)  # half decay
    np.testing.assert_allclose(float(sched(1100)), 1e-4, rtol=1e-5)  # floor
    np.testing.assert_allclose(float(sched(99999)), 1e-4, rtol=1e-5)  # clamps


def test_build_schedule_dispatch():
    constant = build_schedule(TrainingConfig(learning_rate=2e-4, warmup_iterations=0))
    np.testing.assert_allclose(float(constant(12345)), 2e-4, rtol=1e-6)
    cosine = build_schedule(
        TrainingConfig(learning_rate=2e-4, warmup_iterations=0, end_iteration=1000, schedule="cosine")
    )
    np.testing.assert_allclose(float(cosine(1000)), 0.0, atol=1e-10)
    with pytest.raises(ValueError):
        build_schedule(TrainingConfig(schedule="bogus"))


def test_optimizer_knobs_grad_clip_and_weight_decay():
    import jax.numpy as jnp
    import optax

    from pero_pretraining_tpu.training.trainer import build_optimizer

    params = {"w": jnp.ones((4,))}
    huge = {"w": jnp.full((4,), 1e6)}

    cfg = TrainingConfig(learning_rate=1.0, warmup_iterations=0, grad_clip=1.0)
    tx = build_optimizer(cfg, build_schedule(cfg))
    state = tx.init(params)
    updates, _ = tx.update(huge, state, params)
    # Adam normalizes to ~lr per coord regardless; the clip must not explode it
    assert float(jnp.abs(updates["w"]).max()) <= 1.0 + 1e-5

    cfg = TrainingConfig(learning_rate=0.1, warmup_iterations=0, weight_decay=0.5)
    tx = build_optimizer(cfg, build_schedule(cfg))
    decay_params = {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((4,))}
    state = tx.init(decay_params)
    zeros = {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((4,))}
    updates, _ = tx.update(zeros, state, decay_params)
    # with zero grads AdamW still shrinks MATRIX params: update = -lr * wd * w;
    # biases/norm scales (ndim < 2) are excluded from decay (standard practice)
    np.testing.assert_allclose(np.asarray(updates["kernel"]), -0.05, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["bias"]), 0.0, atol=1e-8)

    cfg = TrainingConfig(learning_rate=0.1, warmup_iterations=0)
    tx = build_optimizer(cfg, build_schedule(cfg))
    updates, _ = tx.update(zeros, tx.init(decay_params), decay_params)
    np.testing.assert_allclose(np.asarray(updates["kernel"]), 0.0, atol=1e-8)  # plain Adam: no decay


def test_skip_nonfinite_guard():
    import jax.numpy as jnp

    from pero_pretraining_tpu.training.trainer import build_optimizer

    cfg = TrainingConfig(learning_rate=0.1, warmup_iterations=0, skip_nonfinite=3, grad_clip=1.0)
    tx = build_optimizer(cfg, build_schedule(cfg))
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)

    bad = {"w": jnp.array([1.0, jnp.nan, 1.0, 1.0])}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_array_equal(np.asarray(updates["w"]), 0.0)  # skipped
    assert int(state.notfinite_count) == 1

    good = {"w": jnp.full((4,), 2.0)}
    updates, state = tx.update(good, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0  # resumed
    assert int(state.notfinite_count) == 0


def test_backbone_lr_scale():
    import jax.numpy as jnp

    from pero_pretraining_tpu.training.trainer import build_optimizer

    cfg = TrainingConfig(learning_rate=0.1, warmup_iterations=0, backbone_lr_scale=0.1)
    tx = build_optimizer(cfg, build_schedule(cfg))
    params = {"backbone": {"w": jnp.ones((4,))}, "ctc_head": {"w": jnp.ones((4,))}}
    grads = {"backbone": {"w": jnp.full((4,), 2.0)}, "ctc_head": {"w": jnp.full((4,), 2.0)}}
    updates, _ = tx.update(grads, tx.init(params), params)
    # Adam's first-step update magnitude is ~lr per coordinate: the backbone
    # update must be ~0.1x the head update
    ratio = float(jnp.abs(updates["backbone"]["w"]).mean() / jnp.abs(updates["ctc_head"]["w"]).mean())
    np.testing.assert_allclose(ratio, 0.1, rtol=1e-4)
