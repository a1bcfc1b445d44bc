"""Dead-code restarts in the EMA VectorQuantizer (beyond the reference).

The reference computes per-code usage `counts` but its codebook-utilization
reporting is an unfinished TODO (reference: autoencoders/train.py:114;
models/autoencoders.py:165) — codebook collapse is the failure mode that TODO
never got to diagnosing. `VQConfig.restart_threshold` re-seeds codes whose EMA
cluster size drops below an absolute threshold from random encoder outputs of
the current batch, keyed deterministically on a step counter carried in the
`vq` collection.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.models.autoencoders import VectorQuantizer


def _quantizer(restart_threshold):
    return VectorQuantizer(
        num_embeddings=16,
        embeddings_dim=4,
        decay=0.5,  # fast EMA so cluster sizes move within a few steps
        restart_threshold=restart_threshold,
    )


def _collapsing_inputs(key, n=256):
    # two tight clusters near the origin: with a normal(1.0) codebook init,
    # only the 1-2 codes nearest the origin ever win the argmin
    centers = jnp.asarray([[0.05, 0.0, 0.0, 0.0], [-0.05, 0.0, 0.0, 0.0]])
    which = jax.random.bernoulli(key, shape=(n,)).astype(jnp.int32)
    pts = centers[which] + 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (n, 4))
    return pts.reshape(1, 1, n, 4)


def _codes_used(vq, variables, x):
    _, indices = vq.apply(variables, x, train=False)
    return len(np.unique(np.asarray(indices)))


def _train_steps(vq, variables, key, steps=20):
    for i in range(steps):
        x = _collapsing_inputs(jax.random.fold_in(key, 100 + i))
        (_, _), mutated = vq.apply(variables, x, train=True, mutable=["vq"])
        variables = {"vq": dict(mutated["vq"])}
    return variables


def test_ema_collapses_without_restarts():
    vq = _quantizer(0.0)
    key = jax.random.PRNGKey(0)
    variables = vq.init({"params": key}, _collapsing_inputs(key), train=False)
    variables = _train_steps(vq, {"vq": variables["vq"]}, key)
    # degenerate data + no restarts: nearly all codes stay dead
    assert _codes_used(vq, variables, _collapsing_inputs(jax.random.fold_in(key, 999))) <= 3


def test_restarts_revive_dead_codes():
    vq = _quantizer(0.05)
    key = jax.random.PRNGKey(0)
    variables = vq.init({"params": key}, _collapsing_inputs(key), train=False)
    assert "restart_step" in variables["vq"]
    variables = _train_steps(vq, {"vq": variables["vq"]}, key)
    used = _codes_used(vq, variables, _collapsing_inputs(jax.random.fold_in(key, 999)))
    # restarted codes sit ON batch activations, so many codes win frames again
    assert used >= 8
    assert int(variables["vq"]["restart_step"]) == 20


def test_restarts_deterministic():
    vq = _quantizer(0.05)
    key = jax.random.PRNGKey(0)
    init = vq.init({"params": key}, _collapsing_inputs(key), train=False)
    v1 = _train_steps(vq, {"vq": init["vq"]}, key, steps=5)
    v2 = _train_steps(vq, {"vq": init["vq"]}, key, steps=5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), v1, v2
    )


def test_restarts_off_is_reference_faithful():
    """restart_threshold=0 must leave the EMA recipe byte-identical."""
    key = jax.random.PRNGKey(3)
    x = _collapsing_inputs(key)
    outs = {}
    for thr in (0.0, -1.0):
        vq = _quantizer(thr)
        variables = vq.init({"params": key}, x, train=False)
        (_, _), mutated = vq.apply({"vq": variables["vq"]}, x, train=True, mutable=["vq"])
        outs[thr] = mutated["vq"]
    np.testing.assert_array_equal(
        np.asarray(outs[0.0]["embedding"]), np.asarray(outs[-1.0]["embedding"])
    )


def test_data_init_starts_on_distribution():
    """data_init codebook = jittered batch rows: embedding == ema_w, cluster
    sizes start at 1, and utilization is immediately high on collapsing data
    (the normal(1.0) init uses <=3 codes on the same batch)."""
    vq = VectorQuantizer(num_embeddings=16, embeddings_dim=4, decay=0.5, data_init=True)
    key = jax.random.PRNGKey(0)
    x = _collapsing_inputs(key)
    variables = vq.init({"params": key}, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(variables["vq"]["embedding"]), np.asarray(variables["vq"]["ema_w"])
    )
    np.testing.assert_array_equal(
        np.asarray(variables["vq"]["ema_cluster_size"]), np.ones(16, np.float32)
    )
    used0 = _codes_used(vq, {"vq": variables["vq"]}, x)
    assert used0 >= 8  # on-distribution from step 0
    # and it STAYS diverse through EMA training
    trained = _train_steps(vq, {"vq": variables["vq"]}, key)
    assert _codes_used(vq, trained, _collapsing_inputs(jax.random.fold_in(key, 999))) >= 8
