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

from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS, PIPE_AXIS

# (path regex, spec factory). Specs reference MODEL_AXIS only; DATA_AXIS is
# used for batch sharding, params are replicated across it.
DEFAULT_RULES: Sequence[Tuple[str, P]] = (
    # stacked encoder blocks (pipeline parallelism, parallel/pipeline.py):
    # every leaf has a leading layer axis sharded over `pipe`. MUST come
    # before the generic attention/mlp rules (those specs assume unstacked
    # ranks). TP inside the pipelined region is unsupported by design.
    (r".*blocks.*", P(PIPE_AXIS)),
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
    # MoE expert weights (models/moe.py): stacked (E, D, F) / (E, F, D) —
    # experts over `expert` (expert parallelism), hidden over `model` (TP);
    # the router stays replicated (it is tiny and every token needs it)
    (r".*moe.*w1", P(EXPERT_AXIS, None, MODEL_AXIS)),
    (r".*moe.*w2", P(EXPERT_AXIS, MODEL_AXIS, None)),
    (r".*moe.*b1", P(EXPERT_AXIS, MODEL_AXIS)),
    (r".*moe.*b2", P(EXPERT_AXIS, None)),
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


def fsdp_param_shardings(params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """ZeRO-3 / FSDP: fully shard PARAMETERS over the `data` mesh axis, purely
    by sharding annotations (the reference has no distributed support at all,
    SURVEY.md §2.7; ZeRO-1 — `zero1_opt_state_shardings` — shards only the
    optimizer moments).

    Per leaf: start from the tensor-parallel rule spec (so `model`/`pipe`
    dims stay put), then place `data` on the largest free dim divisible by
    the data axis size. GSPMD then all-gathers each weight just-in-time in
    forward/backward and reduce-scatters its gradient — per-chip parameter
    residency divides by the data size, the standard FSDP recipe. Scalars
    and indivisible leaves stay replicated (always valid)."""
    data_size = mesh.shape[DATA_AXIS]

    def leaf_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        shape = tuple(getattr(leaf, "shape", ()))
        base = list(_spec_for(_path_str(path), ndim, rules))
        base = base + [None] * (ndim - len(base))
        if ndim == 0 or data_size <= 1:
            return NamedSharding(mesh, P(*base))
        free = [i for i in range(ndim) if base[i] is None and shape[i] % data_size == 0 and shape[i] >= data_size]
        if free:
            base[max(free, key=lambda i: shape[i])] = DATA_AXIS
        return NamedSharding(mesh, P(*base))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def _param_matcher(params: Any, value_fn):
    """Build `match(opt_leaf_path_str, shape) -> value | None` resolving each
    optimizer-state leaf to its param's value, where
    `value_fn(path_str, leaf)` produces the per-param value.

    optax wrapper states (chain / multi_transform / apply_if_finite) mirror
    the param tree inside their moment trees, so a moment leaf's path ENDS
    with its param's path (e.g. `0/mu/backbone/block0/.../kernel`). Matching
    by path suffix (shape-checked, longest suffix wins) keeps same-shaped
    params with different rule specs on their own layouts — shape-only
    matching could pin `data` onto a dim the param shards over `model` and
    silently force a per-step reshard."""
    by_path: dict = {}

    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        path_str = _path_str(path)
        by_path[path_str] = (tuple(getattr(leaf, "shape", ())), value_fn(path_str, leaf))

    def match(path_str: str, shape: Tuple[int, ...]):
        candidates = [
            (param_path, value)
            for param_path, (param_shape, value) in by_path.items()
            if param_shape == shape and (path_str == param_path or path_str.endswith("/" + param_path))
        ]
        if not candidates:
            return None
        return max(candidates, key=lambda c: len(c[0]))[1]

    return match


def zero1_opt_state_shardings(
    opt_state: Any, params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES
):
    """ZeRO-1: NamedSharding tree partitioning optimizer state over `data`.

    The flagship trace (docs/PROFILE.md) shows the fused Adam update running at
    the HBM roofline at ~1/3 of the step; on a data-parallel mesh that traffic
    is redundant — every chip streams identical moment tensors. Sharding the
    moments over `data` divides it by the mesh size: GSPMD then reduce-scatters
    the gradients into the update (instead of all-reducing), runs the
    elementwise Adam math on 1/data_size of the elements per chip, and
    all-gathers the param updates — the standard ZeRO-1 recipe, expressed
    purely as sharding annotations (no hand-written collectives; the reference
    has no distributed support at all, SURVEY.md §2.7).

    Spec choice per leaf: start from the tensor-parallel spec of the param the
    leaf mirrors (path-suffix match via `_param_matcher`, so `model`-sharded
    dims stay put and no cross-axis reshard is induced), then place `data` on
    the largest free dim divisible by the data axis size. Scalars (step
    counts) and indivisible leaves stay replicated. Leaves with no path match
    fall back to a shape lookup (unique-spec shapes only); remaining ambiguity
    logs once and replicates the base spec, which is always valid."""
    import logging

    data_size = mesh.shape[DATA_AXIS]

    match = _param_matcher(
        params,
        lambda path_str, leaf: tuple(_spec_for(path_str, getattr(leaf, "ndim", 0), rules)),
    )

    specs_by_shape: dict = {}

    def collect(path, leaf):
        spec = _spec_for(_path_str(path), getattr(leaf, "ndim", 0), rules)
        specs_by_shape.setdefault(tuple(leaf.shape), set()).add(tuple(spec))

    jax.tree_util.tree_map_with_path(collect, params)
    warned = set()

    def leaf_sharding(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        ndim = len(shape)
        if ndim == 0 or data_size <= 1:
            return NamedSharding(mesh, P())
        base_spec = match(_path_str(path), shape)
        if base_spec is None:
            seen = specs_by_shape.get(shape)
            if seen and len(seen) == 1:
                base_spec = next(iter(seen))
            else:
                if seen and shape not in warned:
                    warned.add(shape)
                    logging.getLogger(__name__).warning(
                        "zero1_opt_state_shardings: opt-state leaf %s (shape %s) matched no "
                        "param path and the shape is spec-ambiguous; using a replicated base spec",
                        _path_str(path),
                        shape,
                    )
                base_spec = ()
        base = list(base_spec) + [None] * (ndim - len(base_spec))
        free = [i for i in range(ndim) if base[i] is None and shape[i] % data_size == 0 and shape[i] >= data_size]
        if free:
            base[max(free, key=lambda i: shape[i])] = DATA_AXIS
        return NamedSharding(mesh, P(*base))

    return jax.tree_util.tree_map_with_path(leaf_sharding, opt_state)


def opt_state_shardings_like_params(opt_state: Any, params: Any, param_placements: Any, mesh: Mesh):
    """Place each optimizer-state leaf with the NamedSharding of the param it
    mirrors (path-suffix match through optax wrapper states, shape-checked);
    unmatched leaves (step counters, schedule states) replicate.

    Used when RESUMING without ZeRO-1: at init the moments inherit the param
    layout through jit(tx.init), but a checkpoint load re-places them — with
    FSDP on, placing them replicated() would materialize full-size moments per
    chip, exactly the memory FSDP shards away (potential resume-only OOM)."""
    placements_by_path = {
        _path_str(path): placement
        for path, placement in jax.tree_util.tree_flatten_with_path(
            param_placements, is_leaf=lambda x: isinstance(x, NamedSharding)
        )[0]
    }
    match = _param_matcher(params, lambda path_str, leaf: placements_by_path[path_str])
    rep = NamedSharding(mesh, P())

    def leaf_sharding(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if not shape:
            return rep
        placement = match(_path_str(path), shape)
        return placement if placement is not None else rep

    return jax.tree_util.tree_map_with_path(leaf_sharding, opt_state)


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
