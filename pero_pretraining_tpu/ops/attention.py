"""Multi-head attention compute path.

Functional core used by the transformer backbone. The default path is a plain
einsum formulation — at the sequence lengths of this workload (256-512 frames)
XLA fuses it well on the MXU. A Pallas flash-attention kernel can be swapped in
via `impl="flash"` for long-sequence configurations (ops/flash_attention.py).

Semantics match torch.nn.MultiheadAttention used by the reference's encoder
stack (reference: models/transformers.py:36-43): fused qkv projection, scaled
dot-product, no key-padding mask (the reference attends over padding too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    impl: str = "xla",
    mesh=None,
) -> jax.Array:
    """q, k, v: (N, S, num_heads, head_dim) -> (N, S, num_heads, head_dim).

    impl="ring" is sequence-parallel ring attention over the mesh's `seq`
    axis (parallel/ring.py); requires the mesh."""
    if impl == "flash":
        from pero_pretraining_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    if impl == "ring":
        from pero_pretraining_tpu.parallel.ring import ring_attention

        if mesh is None:
            raise ValueError("attention impl='ring' requires the device mesh")
        return ring_attention(q, k, v, mesh=mesh)

    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=q.dtype))
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", weights, v)
