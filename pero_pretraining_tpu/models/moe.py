"""Mixture-of-Experts FFN with expert parallelism over an `expert` mesh axis.

Capability extension beyond the reference, which has a dense FFN only
(reference: models/transformers.py:11-12 — `dim_feedforward=2048`; SURVEY.md
§2.7 lists expert parallelism as absent). The TPU-native formulation is the
Switch-Transformer / Mesh-TensorFlow static dispatch: routing becomes one-hot
dispatch/combine tensors and ALL data movement is einsums on the MXU — no
dynamic gathers, no data-dependent shapes, so the whole thing jits once.

Per token the router picks top-k experts; each (line, expert) pair has a
fixed capacity C = ceil(capacity_factor * k * S / E) token slots. Tokens over
capacity are dropped for that expert (their combine weight is zero, so they
ride the residual connection unchanged — the standard Switch behavior).

Expert parallelism: the stacked expert weights (E, D, F) shard over the
`expert` mesh axis and the dispatched activations (N, E, C, D) are pinned to
(data, expert) sharding — GSPMD inserts the token all-to-all over ICI. The
hidden dim additionally shards over `model`, so EP composes with tensor
parallelism.

The router's load-balance auxiliary loss (Switch eq. 4: E * sum_e f_e * P_e,
= 1.0 at perfect balance) is sown into the "aux" flax collection; task
adapters pop it with `pop_router_aux` and add `router_aux_weight` * aux to
the training loss.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def pop_router_aux(state: dict) -> Optional[dict]:
    """Remove the sown \"aux\" collection from an apply() state dict and
    return router metrics averaged over all MoE layers (None if the model has
    no MoE layers or ran without the collection mutable):

    - "router_aux": the Switch load-balance loss (1.0 at perfect balance) —
      the term task losses weight by router_aux_weight,
    - "router_dropped_frac": fraction of (token, k) routing assignments
      dropped for exceeding expert capacity (those tokens ride the residual
      unchanged). A persistently high value means capacity_factor is too low
      or the router has collapsed onto few experts — the signal Switch-style
      training must monitor, so it is reported in the per-step metrics."""
    aux = state.pop("aux", None)
    if not aux:
        return None

    def mean_of(name: str) -> Optional[jax.Array]:
        leaves = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(aux)[0]
            if name in jax.tree_util.keystr(path)
        ]
        if not leaves:
            return None
        total = leaves[0]
        for leaf in leaves[1:]:
            total = total + leaf
        return total / len(leaves)

    balance = mean_of("load_balance")
    if balance is None:
        return None
    out = {"router_aux": balance}
    dropped = mean_of("dropped_frac")
    if dropped is not None:
        out["router_dropped_frac"] = dropped
    return out


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for the dense encoder-block MLP.

    x: (N, S, D) -> (N, S, D). Matches `Mlp` (fc1 -> relu -> fc2) per expert;
    with num_experts=1 and capacity_factor >= 1 the output is exactly the
    dense MLP (the single gate is softmax over one logit = 1.0 and no token
    is dropped) — tested in tests/test_moe.py.
    """

    model_dim: int
    hidden_dim: int
    num_experts: int
    topk: int = 1
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        n, s, d = x.shape
        e, k = self.num_experts, self.topk
        c = min(int(math.ceil(self.capacity_factor * k * s / e)), s)

        # --- routing (fp32: softmax over expert logits must not saturate) ---
        logits = nn.Dense(e, name="router", use_bias=False, dtype=jnp.float32)(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (N, S, E)
        gate_vals, gate_idx = jax.lax.top_k(probs, k)  # (N, S, K)
        if k > 1:
            # renormalize the selected gates (standard top-2 practice)
            gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)

        # --- static one-hot dispatch with per-(line, expert) capacity ---
        # combine[n, s, e, c] = gate weight of token (n, s) in slot c of
        # expert e (zero if not routed there / over capacity)
        combine = jnp.zeros((n, s, e, c), jnp.float32)
        used = jnp.zeros((n, e), jnp.float32)  # slots consumed by earlier k
        for j in range(k):
            oh = jax.nn.one_hot(gate_idx[..., j], e, dtype=jnp.float32)  # (N, S, E)
            # slot index per token: tokens claim slots in sequence order;
            # one_hot maps out-of-range (>= c) slots to all-zeros, which IS
            # the capacity drop
            pos = jnp.cumsum(oh, axis=1) - 1.0 + used[:, None, :]
            slot = jax.nn.one_hot(pos.astype(jnp.int32), c, dtype=jnp.float32)  # (N, S, E, C)
            combine = combine + gate_vals[..., j][..., None, None] * oh[..., None] * slot
            used = used + jnp.sum(oh * (pos < c), axis=1)
        dispatch = (combine > 0).astype(self.dtype)  # (N, S, E, C)

        # --- expert computation: batched einsums over the expert dim ---
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(batch_axis=(0,)), (e, d, self.hidden_dim), jnp.float32
        )
        b1 = self.param("b1", nn.initializers.zeros, (e, self.hidden_dim), jnp.float32)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(batch_axis=(0,)), (e, self.hidden_dim, d), jnp.float32
        )
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)

        xd = jnp.einsum("nsec,nsd->necd", dispatch, x.astype(self.dtype))
        xd = self._expert_constraint(xd)  # all-to-all: tokens -> expert shards
        h = jnp.einsum("necd,edf->necf", xd, w1.astype(self.dtype)) + b1.astype(self.dtype)[None, :, None, :]
        h = nn.relu(h)
        out = jnp.einsum("necf,efd->necd", h, w2.astype(self.dtype)) + b2.astype(self.dtype)[None, :, None, :]
        out = self._expert_constraint(out)  # all-to-all back: experts -> tokens
        y = jnp.einsum("nsec,necd->nsd", combine.astype(self.dtype), out)

        # --- load-balance aux loss (Switch eq. 4; 1.0 at perfect balance) ---
        top1 = jax.nn.one_hot(gate_idx[..., 0], e, dtype=jnp.float32)
        frac_tokens = jnp.mean(top1, axis=(0, 1))  # f_e
        frac_probs = jnp.mean(probs, axis=(0, 1))  # P_e
        self.sow("aux", "load_balance", e * jnp.sum(frac_tokens * frac_probs))
        # fraction of (token, k) assignments dropped for exceeding capacity:
        # `used` holds the KEPT count per (line, expert) summed over k
        kept = jnp.sum(used)
        self.sow("aux", "dropped_frac", 1.0 - kept / (n * s * k))

        return y

    def _expert_constraint(self, t: jax.Array) -> jax.Array:
        """Pin (N, E, C, D) dispatched activations to (data, expert) sharding
        so GSPMD materializes the token all-to-all over the `expert` axis."""
        if self.mesh is None:
            return t
        from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS

        if self.mesh.shape.get(EXPERT_AXIS, 1) <= 1:
            return t
        spec = PartitionSpec(DATA_AXIS, EXPERT_AXIS, None, None)
        return jax.lax.with_sharding_constraint(t, NamedSharding(self.mesh, spec))
