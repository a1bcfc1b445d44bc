"""Pipeline parallelism: GPipe over a `pipe` mesh axis via shard_map.

Capability extension beyond the reference, which is single-device (SURVEY.md
§2.7 lists pipeline parallelism as absent). The encoder block stack is the
pipelined region: its L blocks live as ONE stacked parameter tree with a
leading layer axis, sharded over `pipe` so each chip physically holds L/P
consecutive blocks. Execution is the classic SPMD pipeline loop:

  - the local batch is split into M microbatches,
  - over M + P - 1 ticks, every stage runs its local blocks on the
    microbatch it currently holds and passes the result one hop down the
    ring via `lax.ppermute` (ICI neighbor exchange),
  - stage 0 feeds microbatch t at tick t; the last stage emits finished
    microbatches from tick P-1 on; the bubble fraction is (P-1)/(M+P-1),
  - the output is broadcast back to all pipe members with one psum so the
    (replicated-over-pipe) head/loss sees the full batch.

The backward pass is pure autodiff: the transpose of ppermute is the reverse
rotation and the transpose of the tick scan is the reverse-order pipeline —
no hand-written backward schedule.

Composition: PP x DP works (batch shards over `data` inside the same
shard_map); TP/SP/EP inside the pipelined region would need manual
collectives and are rejected at construction (they are also unnecessary at
this model scale — use the `data`/`seq`/`expert` axes instead when not
pipelining).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS, PIPE_AXIS, SEQ_AXIS


def stack_block_params(block_params: list) -> Any:
    """Stack per-block param trees (block0..blockL-1) into one tree with a
    leading layer axis — the pipelined ('blocks') checkpoint layout."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *block_params)


def unstack_block_params(stacked: Any, num_blocks: int) -> list:
    """Inverse of stack_block_params: back to per-block trees (block0..)."""
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(num_blocks)]


def sequential_apply(
    template, stacked_params: Any, x: jax.Array, train: bool, *, remat: bool = False,
    unroll: int = 1
) -> jax.Array:
    """Run the stacked block stack sequentially (single-device / pipe=1
    path): one lax.scan over the layer axis — same numerics as the pipeline,
    same param layout, no collectives.

    unroll: lax.scan unroll factor. A rolled scan (unroll=1) compiles ONE
    block body but its dynamic layer-param slicing blocks XLA's cross-layer
    fusion — measured -33.6% on the flagship at pipe=1. Full unroll
    (unroll=num_blocks, the default via BackboneConfig.stacked_unroll)
    recovers most of it: 1945 -> 2609 lines/s, leaving -11.0% vs the
    unstacked default (docs/bench_overheads.json), at the cost of longer
    compiles."""

    def block(layer_params, h):
        return template.apply({"params": layer_params}, h, train)

    if remat:
        block = jax.checkpoint(block)

    def body(h, layer_params):
        return block(layer_params, h), None

    out, _ = lax.scan(body, x, stacked_params, unroll=max(unroll, 1))
    return out


def validate_pipeline_mesh(mesh: Mesh, num_blocks: int, dropout: float) -> int:
    """Checks shared by module construction and pipeline_apply; returns the
    pipe size."""
    pipe = mesh.shape.get(PIPE_AXIS, 1)
    if pipe <= 1:
        return pipe
    if num_blocks % pipe != 0:
        raise ValueError(f"num_blocks {num_blocks} not divisible by pipe axis {pipe}")
    for axis in (SEQ_AXIS, MODEL_AXIS, EXPERT_AXIS):
        if mesh.shape.get(axis, 1) > 1:
            raise ValueError(
                f"pipeline parallelism does not compose with the `{axis}` mesh axis "
                "(the pipelined region is manual over `pipe`; use dp x pp)"
            )
    if dropout > 0:
        raise ValueError("pipeline parallelism requires dropout=0 (no rngs inside the pipe loop)")
    return pipe


def pipeline_apply(
    template,
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    microbatches: int,
    train: bool,
    remat: bool = False,
) -> jax.Array:
    """GPipe forward of the stacked block stack over the `pipe` mesh axis.

    template: an unbound EncoderBlock (applied per layer slice);
    stacked_params: tree with leading layer axis L (sharded over `pipe`);
    x: (N, S, D) logical activations (sharded over `data`, replicated over
    `pipe`). Returns (N, S, D).
    """
    num_blocks = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    pipe = validate_pipeline_mesh(mesh, num_blocks, 0.0)
    m = microbatches

    def local(params_local, xl):
        # params_local: (L/P, ...) this stage's blocks; xl: (N_local, S, D)
        stage = lax.axis_index(PIPE_AXIS)
        n_loc = xl.shape[0]
        if n_loc % m != 0:
            raise ValueError(
                f"local batch {n_loc} not divisible by {m} pipeline microbatches "
                "(note grad_accum and the data axis both divide the global batch first; "
                "set pipeline_microbatches in the backbone config)"
            )
        micro = xl.reshape(m, n_loc // m, *xl.shape[1:])

        def block(layer_params, h):
            return template.apply({"params": layer_params}, h, train)

        if remat:
            block = jax.checkpoint(block)

        def run_stage(xb):
            def body(h, layer_params):
                return block(layer_params, h), None

            h, _ = lax.scan(body, xb, params_local)
            return h

        ticks = m + pipe - 1
        perm = [(i, (i + 1) % pipe) for i in range(pipe)]

        def tick(carry, t):
            recv, outbuf = carry
            x0 = lax.dynamic_index_in_dim(micro, jnp.clip(t, 0, m - 1), axis=0, keepdims=False)
            x_in = jnp.where(stage == 0, x0, recv)
            y = run_stage(x_in)
            # rotate one hop down the ring (the last->0 edge carries a value
            # stage 0 never reads — it always feeds fresh microbatches)
            recv_next = lax.ppermute(y, PIPE_AXIS, perm)
            out_idx = jnp.clip(t - (pipe - 1), 0, m - 1)
            write = (t >= (pipe - 1)) & (stage == pipe - 1)
            cur = lax.dynamic_index_in_dim(outbuf, out_idx, axis=0, keepdims=False)
            outbuf = lax.dynamic_update_index_in_dim(outbuf, jnp.where(write, y, cur), out_idx, axis=0)
            return (recv_next, outbuf), None

        outbuf = jnp.zeros_like(micro)
        (_, outbuf), _ = lax.scan(tick, (jnp.zeros_like(micro[0]), outbuf), jnp.arange(ticks))
        out = outbuf.reshape(xl.shape)
        # broadcast the finished batch from the last stage to all pipe members
        return lax.psum(jnp.where(stage == pipe - 1, out, jnp.zeros_like(out)), PIPE_AXIS)

    param_specs = jax.tree_util.tree_map(
        lambda leaf: P(PIPE_AXIS, *([None] * (leaf.ndim - 1))), stacked_params
    )
    x_spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    return fn(stacked_params, x)
