"""Blockwise (flash) attention Pallas kernel for TPU.

Online-softmax attention that never materializes the (S, S) score matrix:
O(S) memory instead of O(S^2), with all matmuls on the MXU. Used by the
transformer backbones via `attention_impl="flash"` — at the default line
length (256-512 frames) XLA's fused attention is already fine; this kernel is
the scaling path for long-line configurations (max_len up to 4096,
SURVEY.md §5 long-context notes).

Layout: inputs (N, S, H, hd) are reshaped to (N*H, S, hd); the grid runs one
program per (batch*head, q-block). The backward pass recomputes attention
blockwise (standard flash-attention two-pass VJP: a dq pass and a dkv pass),
so training memory stays O(S).

Kernel-design notes (pallas_guide.md): block sizes are multiples of the
(8/16, 128) tile; accumulation in fp32 via preferred_element_type; fori_loop
carries the online-softmax state instead of scratch refs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30


def _interpret() -> bool:
    # compiled Mosaic kernels need a real TPU; interpret elsewhere (tests)
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, seq_len):
    q = q_ref[0].astype(jnp.float32) * scale  # (Bq, hd)
    bq, hd = q.shape
    num_kb = seq_len // block_k

    def body(j, carry):
        o, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        o_new = o * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return o_new, m_new, l_new

    o = jnp.zeros((bq, hd), jnp.float32)
    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    o, m, l = jax.lax.fori_loop(0, num_kb, body, (o, m, l))

    o_ref[0] = (o / l).astype(o_ref.dtype)
    # lse is materialized at (Bq, 8) — Mosaic needs >= (8, lane-legal)
    # trailing block dims; lane dim 8 matches the array's last dim
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))


def _flash_fwd(q, k, v, *, block_q, block_k):
    bh, s, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    grid = (bh, s // block_q)
    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=block_k, seq_len=s)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, hd), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, s, 8), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v)
    return o, lse


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dk_ref, dv_ref, *, scale, block_q, seq_len):
    """One program per (bh, k-block): accumulate dk, dv over all q blocks."""
    k = k_ref[0].astype(jnp.float32)  # (Bk, hd)
    v = v_ref[0].astype(jnp.float32)
    bk, hd = k.shape
    num_qb = seq_len // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        o = o_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :][:, :1]
        s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)  # (Bq, Bk)
        dv_new = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=1, keepdims=True)
        ds = p * (dp - delta)  # (Bq, Bk)
        dk_new = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk = jnp.zeros((bk, hd), jnp.float32)
    dv = jnp.zeros((bk, hd), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, *, scale, block_k, seq_len):
    """One program per (bh, q-block): accumulate dq over all k blocks."""
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    bq, hd = q.shape
    delta = jnp.sum(do * o, axis=1, keepdims=True)
    num_kb = seq_len // block_k

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, hd), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, block_q, block_k):
    o, _ = _flash_fwd(q, k, v, block_q=block_q, block_k=block_k)
    return o


def _flash_vjp_fwd(q, k, v, block_q, block_k):
    o, lse = _flash_fwd(q, k, v, block_q=block_q, block_k=block_k)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(block_q, block_k, residuals, do):
    q, k, v, o, lse = residuals
    bh, s, hd = q.shape
    scale = 1.0 / math.sqrt(hd)

    dkv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q, seq_len=s),
        grid=(bh, s // block_k),
        in_specs=[
            pl.BlockSpec((1, s, hd), lambda b, j: (b, 0, 0)),  # q
            pl.BlockSpec((1, block_k, hd), lambda b, j: (b, j, 0)),  # k
            pl.BlockSpec((1, block_k, hd), lambda b, j: (b, j, 0)),  # v
            pl.BlockSpec((1, s, hd), lambda b, j: (b, 0, 0)),  # o
            pl.BlockSpec((1, s, hd), lambda b, j: (b, 0, 0)),  # do
            pl.BlockSpec((1, s, 8), lambda b, j: (b, 0, 0)),  # lse
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, hd), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, j: (b, j, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype), jax.ShapeDtypeStruct(v.shape, v.dtype)],
        interpret=_interpret(),
    )(q, k, v, o, do, lse)
    dk, dv = dkv

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k, seq_len=s),
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),  # q
            pl.BlockSpec((1, s, hd), lambda b, i: (b, 0, 0)),  # k
            pl.BlockSpec((1, s, hd), lambda b, i: (b, 0, 0)),  # v
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),  # o
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),  # do
            pl.BlockSpec((1, block_q, 8), lambda b, i: (b, i, 0)),  # lse
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, o, do, lse)

    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """q, k, v: (N, S, H, hd) -> (N, S, H, hd).

    S must be a multiple of the block size for the Pallas path; ragged
    lengths fall back to the XLA implementation (correct, just not
    memory-blocked — fine at the short sequences where ragged shapes occur)."""
    n, s, h, hd = q.shape

    block_q = min(block_q, max(8, s))
    block_k = min(block_k, max(8, s))
    pad = (-s) % max(block_q, block_k)
    if pad:
        # simplest correct padding: pad keys with -inf scores via a huge
        # negative bias on the padded rows of k is not expressible post-hoc,
        # so fall back to the XLA path for ragged lengths
        from pero_pretraining_tpu.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, impl="xla")

    qr = q.transpose(0, 2, 1, 3).reshape(n * h, s, hd)
    kr = k.transpose(0, 2, 1, 3).reshape(n * h, s, hd)
    vr = v.transpose(0, 2, 1, 3).reshape(n * h, s, hd)
    o = _flash(qr, kr, vr, block_q, block_k)
    return o.reshape(n, h, s, hd).transpose(0, 2, 1, 3)
