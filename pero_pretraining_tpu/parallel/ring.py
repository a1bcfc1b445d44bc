"""Sequence-parallel ring attention over the `seq` mesh axis.

Capability extension beyond the reference, which has no distributed support
at all and handles long lines by truncation or concatenation (reference:
common/dataset.py:80, 206-236 — SURVEY.md §2.7 lists sequence parallelism as
absent). On TPU the natural long-context recipe is to shard the frame axis
over a `seq` mesh axis: every chip holds S/n frames of every line, LayerNorm/
MLP/head are pointwise over frames (GSPMD shards them for free), and the one
cross-frame op — attention — runs as a shard_map ring:

  - each chip computes online-softmax attention of its local Q block against
    the KV block it currently holds,
  - KV blocks rotate one hop around the `seq` ring via `lax.ppermute` (ICI
    neighbor exchange, the cheapest collective there is),
  - after seq_size hops every Q has seen every KV exactly once and the
    accumulated (o, m, l) state IS the exact softmax attention.

This is bidirectional (encoder) ring attention: no causal masking, every
block contributes. The per-hop block update is wrapped in `jax.checkpoint`,
so the (S_q_local, S_k_local) score tile is recomputed in the backward pass
instead of stored — per-chip attention memory stays O(S/n), the flash
property, while all matmuls stay MXU-shaped.

Numerics: the online-softmax accumulation is exact (same algorithm as
ops/flash_attention.py) up to fp rounding; q/k/v blocks travel in their input
dtype and are upcast to fp32 inside each block update, matching the fp32
softmax of the default XLA path (ops/attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

_NEG_INF = -1e30


# Q rows per inner tile: bounds the transient score tile to
# (N, H, _Q_CHUNK, Sk_local) so per-hop attention memory is O(chunk * S/n)
# even at very long local sequences — the flash property, in XLA. 1024 rows
# keeps the MXU fully fed while capping the tile at a few tens of MB.
_Q_CHUNK = 1024


@functools.partial(jax.checkpoint, static_argnums=())
def _block_update(q_scaled, k, v, o, m, l):
    """One online-softmax accumulation step of local Q against one KV block.

    q_scaled: (N, H, Sq, hd) fp32, pre-scaled by 1/sqrt(hd)
    k, v:     (N, Sk, H, hd) input dtype
    o:        (N, H, Sq, hd) fp32 accumulator
    m, l:     (N, H, Sq) fp32 running max / denominator
    """
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("nhqd,nkhd->nhqk", q_scaled, kf)  # (N, H, Sq, Sk)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1)
    o_new = o * alpha[..., None] + jnp.einsum("nhqk,nkhd->nhqd", p, vf)
    return o_new, m_new, l_new


def _block_update_chunked(q_scaled, k, v, o, m, l, q_chunk: int):
    """_block_update with the Q rows processed in chunks: each chunk's
    (o, m, l) state is independent of the others, so this is a pure memory
    bound (transient tile (N, H, q_chunk, Sk) instead of (N, H, Sq, Sk)) with
    identical numerics."""
    n, h, sq, hd = q_scaled.shape
    if q_chunk <= 0 or sq <= q_chunk or sq % q_chunk != 0:
        return _block_update(q_scaled, k, v, o, m, l)
    nc = sq // q_chunk

    def split(t):  # (N, H, Sq, ...) -> (nc, N, H, q_chunk, ...)
        return jnp.moveaxis(t.reshape(n, h, nc, q_chunk, *t.shape[3:]), 2, 0)

    def merge(t):  # inverse of split
        return jnp.moveaxis(t, 0, 2).reshape(n, h, sq, *t.shape[4:])

    def body(_, xs):
        qq, oo, mm, ll = xs
        return None, _block_update(qq, k, v, oo, mm, ll)

    _, (o2, m2, l2) = lax.scan(body, None, (split(q_scaled), split(o), split(m), split(l)))
    return merge(o2), merge(m2), merge(l2)


def _ring_attention_local(q, k, v, *, axis_name: str, axis_size: int):
    """Per-shard body (inside shard_map). q, k, v: (N, S_local, H, hd)."""
    n, s_loc, h, hd = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    q_scaled = jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.float32) * scale  # (N, H, Sq, hd)

    o = jnp.zeros((n, h, s_loc, hd), jnp.float32)
    m = jnp.full((n, h, s_loc), _NEG_INF, jnp.float32)
    l = jnp.zeros((n, h, s_loc), jnp.float32)

    if axis_size == 1:
        o, m, l = _block_update_chunked(q_scaled, k, v, o, m, l, _Q_CHUNK)
    else:
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

        def hop(carry, _):
            k_blk, v_blk, o, m, l = carry
            o, m, l = _block_update_chunked(q_scaled, k_blk, v_blk, o, m, l, _Q_CHUNK)
            # rotate AFTER computing: overlappable neighbor exchange; after
            # axis_size hops the blocks are back home (no re-shard needed)
            k_blk = lax.ppermute(k_blk, axis_name, perm)
            v_blk = lax.ppermute(v_blk, axis_name, perm)
            return (k_blk, v_blk, o, m, l), None

        (k, v, o, m, l), _ = lax.scan(hop, (k, v, o, m, l), None, length=axis_size)

    out = o / l[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)  # (N, S_local, H, hd)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, mesh: Mesh) -> jax.Array:
    """Sequence-parallel multi-head attention. q, k, v: (N, S, H, hd) logical
    arrays (inside jit); the frame axis shards over `seq`, batch over `data`,
    heads over `model` (when the head count divides). Requires S divisible by
    the seq axis size and N by the data axis size."""
    seq_size = mesh.shape[SEQ_AXIS]
    n, s, h, hd = q.shape
    if s % seq_size != 0:
        raise ValueError(f"sequence length {s} not divisible by seq mesh axis {seq_size}")
    model_axis = MODEL_AXIS if (MODEL_AXIS in mesh.shape and h % mesh.shape[MODEL_AXIS] == 0) else None
    data_axis = DATA_AXIS if n % mesh.shape[DATA_AXIS] == 0 else None
    spec = P(data_axis, SEQ_AXIS, model_axis, None)

    body = functools.partial(_ring_attention_local, axis_name=SEQ_AXIS, axis_size=seq_size)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False)(q, k, v)
