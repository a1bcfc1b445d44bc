"""Warmup schedule parity with the reference formula
(common/lr_scheduler.py:14-24): lr(i) = (i / warmup)^order * base for
i <= warmup, then base; warmup <= 0 means constant."""

import numpy as np

from pero_pretraining_tpu.training.schedules import warmup_polynomial_schedule


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
