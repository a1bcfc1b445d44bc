"""Sharding rules: map parameter-tree paths to PartitionSpecs.

GSPMD approach: we jit the whole train step with `in_shardings` /
`out_shardings` derived from these rules and let XLA insert the collectives
(gradient `psum` over `data` rides ICI; tensor-parallel layers all-reduce over
`model`).

Rules are (regex, PartitionSpec) pairs matched against the '/'-joined path of
each leaf. First match wins; default is full replication. Tensor-parallel
plan for the transformer (Megatron-style, no code from the reference — the
reference has no distributed support at all, SURVEY.md §2.7):

- attention qkv kernels: shard output (head) dim over `model`
- attention out kernel:  shard input (head) dim over `model`
- FFN first matmul:      shard output (hidden) dim over `model`
- FFN second matmul:     shard input (hidden) dim over `model`

With this plan each block needs exactly one all-reduce per sublayer, the
XLA-standard TP recipe.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec factory). Specs reference MODEL_AXIS only; DATA_AXIS is
# used for batch sharding, params are replicated across it.
DEFAULT_RULES: Sequence[Tuple[str, P]] = (
    # fused qkv projection kernel: (model_dim, 3*num_heads*head_dim)
    (r".*attention.*qkv.*kernel", P(None, MODEL_AXIS)),
    (r".*attention.*(query|key|value).*kernel", P(None, MODEL_AXIS)),
    # attention output projection kernel: (num_heads*head_dim, model_dim)
    (r".*attention.*out.*kernel", P(MODEL_AXIS, None)),
    # FFN
    (r".*mlp.*fc1.*kernel", P(None, MODEL_AXIS)),
    (r".*mlp.*fc2.*kernel", P(MODEL_AXIS, None)),
    # biases of model-sharded layers
    (r".*attention.*qkv.*bias", P(MODEL_AXIS)),
    (r".*mlp.*fc1.*bias", P(MODEL_AXIS)),
    # large projection heads: shard the vocabulary/out dim
    (r".*head.*(linear|out_proj).*kernel", P(None, MODEL_AXIS)),
    (r".*head.*(linear|out_proj).*bias", P(MODEL_AXIS)),
    # VQ codebook: replicate (4096x512 is small; assignment is batch-sharded)
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts).lower()


def _spec_for(path_str: str, ndim: int, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path_str):
            if len(spec) <= ndim:
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """NamedSharding tree matching `params`' structure."""

    def leaf_sharding(path, leaf):
        spec = _spec_for(_path_str(path), getattr(leaf, "ndim", 0), rules)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading dim over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a host batch with the leading dim sharded over `data`."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_batch_leading(stacked: Any, mesh: Mesh) -> Any:
    """device_put K stacked batches (K, N, ...): axis 1 shards over `data`."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, stacked)
