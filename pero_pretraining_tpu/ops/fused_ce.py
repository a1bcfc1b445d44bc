"""Fused linear-head + cross-entropy (vocab-chunked, flash-style).

The masked pipeline's head projects (N*S, D=512) frames onto V=4096 labels
and takes a softmax CE (reference: masked_pretraining/model.py:58-63,72-95).
Done naively, training materializes the (N*S, V) logits in fp32 plus the
softmax gradient — ~100 MB of HBM traffic per step that XLA cannot fully
fuse because the logits are a matmul *input* in the backward pass.

This op computes per-position CE with an online logsumexp over vocabulary
chunks (lax.scan), returning only the (N*S,) CE vector. The custom VJP
recomputes each chunk's logits in the backward pass (flash-attention-style
rematerialization): d_logits for a chunk lives only in VMEM between its
softmax and the two matmuls that consume it. MXU does chunked (M,D)x(D,C)
matmuls in bf16 with fp32 accumulation; all reductions are fp32.

Numerics match the unfused path to fp32-accumulation tolerance; masking /
mean-reduction semantics stay OUTSIDE this op (losses/masked_ce.py), so the
masked/unmasked metric surface is unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _chunked(kernel: jax.Array, bias: jax.Array, num_chunks: int):
    d, v = kernel.shape
    if v % num_chunks:
        raise ValueError(f"vocab {v} not divisible by num_chunks {num_chunks}")
    c = v // num_chunks
    return kernel.T.reshape(num_chunks, c, d), bias.reshape(num_chunks, c), c


def _chunk_logits(frames: jax.Array, k_chunk: jax.Array, b_chunk: jax.Array) -> jax.Array:
    """(M, C) fp32 logits for one vocab chunk; bf16 MXU matmul, fp32 accum."""
    z = jax.lax.dot_general(
        frames,
        k_chunk.T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return z + b_chunk.astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_linear_ce(frames, kernel, bias, labels, num_chunks: int = 8):
    """Per-position softmax cross entropy of a linear head, fused.

    frames: (M, D); kernel: (D, V); bias: (V,); labels: (M,) int in [0, V).
    Returns ce: (M,) fp32 = logsumexp(logits) - logits[label].
    """
    ce, _ = _forward(frames, kernel, bias, labels, num_chunks)
    return ce


def _forward(frames, kernel, bias, labels, num_chunks):
    m_rows = frames.shape[0]
    ks, bs, c = _chunked(kernel, bias, num_chunks)
    labels = labels.astype(jnp.int32)

    def step(carry, chunk):
        m, s, ll = carry
        k_chunk, b_chunk, offset = chunk
        z = _chunk_logits(frames, k_chunk, b_chunk)
        m_new = jnp.maximum(m, jnp.max(z, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), axis=-1)
        local = labels - offset
        in_chunk = (local >= 0) & (local < c)
        picked = jnp.take_along_axis(z, jnp.clip(local, 0, c - 1)[:, None], axis=-1)[:, 0]
        ll = jnp.where(in_chunk, picked, ll)
        return (m_new, s, ll), None

    init = (
        jnp.full((m_rows,), -jnp.inf, jnp.float32),
        jnp.zeros((m_rows,), jnp.float32),
        jnp.zeros((m_rows,), jnp.float32),
    )
    offsets = jnp.arange(num_chunks, dtype=jnp.int32) * c
    (m, s, ll), _ = jax.lax.scan(step, init, (ks, bs, offsets))
    lse = m + jnp.log(s)
    return lse - ll, (frames, kernel, bias, labels, lse)


def _fwd(frames, kernel, bias, labels, num_chunks):
    ce, res = _forward(frames, kernel, bias, labels, num_chunks)
    return ce, res


def _bwd(num_chunks, res, ct):
    frames, kernel, bias, labels, lse = res
    ks, bs, c = _chunked(kernel, bias, num_chunks)
    ct = ct.astype(jnp.float32)

    def step(dframes, chunk):
        k_chunk, b_chunk, offset = chunk
        z = _chunk_logits(frames, k_chunk, b_chunk)  # rematerialized
        p = jnp.exp(z - lse[:, None])  # softmax slice
        local = labels - offset
        onehot = (local[:, None] == jnp.arange(c)[None, :]).astype(jnp.float32)
        dz = ct[:, None] * (p - onehot)  # (M, C) — VMEM-resident
        dz_bf = dz.astype(frames.dtype)
        # dframes += dz @ K_chunk ; dK_chunk = dz.T @ frames ; db = sum dz
        dframes = dframes + jax.lax.dot_general(
            dz_bf, k_chunk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dz_bf, frames, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (C, D)
        db = jnp.sum(dz, axis=0)
        return dframes, (dk, db)

    offsets = jnp.arange(num_chunks, dtype=jnp.int32) * c
    dframes, (dks, dbs) = jax.lax.scan(
        step, jnp.zeros(frames.shape, jnp.float32), (ks, bs, offsets)
    )
    v = kernel.shape[1]
    dkernel = dks.reshape(v, kernel.shape[0]).T.astype(kernel.dtype)
    dbias = dbs.reshape(v).astype(bias.dtype)
    return dframes.astype(frames.dtype), dkernel, dbias, None


fused_linear_ce.defvjp(_fwd, _bwd)
