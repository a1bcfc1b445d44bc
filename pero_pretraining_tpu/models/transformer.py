"""Transformer encoder backbones (ViT and VGG-Transformer hybrid).

Behavioral port of the reference backbones (reference:
models/transformers.py:10-151) redesigned for TPU:

- NHWC input, patchify as reshape + one matmul (MXU-native; ops/patchify.py)
  instead of a strided Conv2d,
- batch-major (N, S, D) activations end to end (the reference shuffles through
  seq-major for torch's encoder stack),
- post-LN ReLU blocks matching torch.nn.TransformerEncoderLayer defaults so
  loss curves are comparable,
- pixel-space patch masking fused into the jitted forward (ops/masking.py),
- optional bf16 compute with fp32 params and fp32 softmax/layer-norm.

Output: (N, S, model_dim), one frame per 8 px of width. (The reference
returns (N, D, S) and rearranges in each task model; here the backbone
returns frames-major directly.)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pero_pretraining_tpu.configs import BackboneConfig
from pero_pretraining_tpu.models.positional import PositionalEncoding
from pero_pretraining_tpu.models.vgg import PeroVggStack, VggEncoderStack
from pero_pretraining_tpu.ops.attention import multi_head_attention
from pero_pretraining_tpu.ops.masking import apply_patch_mask, make_mask_tile
from pero_pretraining_tpu.ops.patchify import patchify


class SelfAttention(nn.Module):
    """Fused-qkv self-attention, head dim sharded over the `model` mesh axis
    (parallel/sharding.py rules match the `qkv`/`out` names). With
    impl="ring" the frame axis shards over the mesh's `seq` axis and KV
    blocks rotate via ppermute (parallel/ring.py)."""

    model_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, s, d = x.shape
        head_dim = self.model_dim // self.num_heads
        qkv = nn.Dense(3 * self.model_dim, name="qkv", dtype=self.dtype)(x)
        # split on the MINOR dim at 128-aligned boundaries, then reshape each
        # block to heads: bit-identical to reshape(n,s,3,h,hd)+middle-dim
        # slicing, but the slices are clean layout tiles — the 5-D middle-dim
        # form cost ~460 us/step of physical transpose copies on the flagship
        # trace (docs/flagship_trace_components.json)
        q, k, v = (
            qkv[..., i * self.model_dim : (i + 1) * self.model_dim].reshape(n, s, self.num_heads, head_dim)
            for i in range(3)
        )
        y = multi_head_attention(q, k, v, impl=self.impl, mesh=self.mesh)
        y = y.reshape(n, s, self.model_dim)
        return nn.Dense(self.model_dim, name="out", dtype=self.dtype)(y)


class Mlp(nn.Module):
    model_dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Dense(self.hidden_dim, name="fc1", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.model_dim, name="fc2", dtype=self.dtype)(x)


class EncoderBlock(nn.Module):
    """Post-LN block: x = LN(x + attn(x)); x = LN(x + mlp(x)).

    Matches torch.nn.TransformerEncoderLayer defaults (norm_first=False,
    activation=relu) used by the reference (models/transformers.py:36-43).
    """

    model_dim: int
    num_heads: int
    feedforward_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    mesh: Optional[Mesh] = None
    # MoE FFN (models/moe.py): num_experts > 1 replaces the dense MLP.
    # num_experts <= 1 statically dispatches to the dense Mlp: a 1-expert
    # MoE is mathematically the dense MLP (tests/test_moe.py proves the
    # equality), so it must cost exactly nothing — the measured −17%
    # dispatch/router overhead of running it through the MoE einsums
    # (docs/bench_overheads.json r3) bought nothing.
    num_experts: int = 0
    expert_topk: int = 1
    expert_capacity: float = 1.25

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = SelfAttention(
            self.model_dim,
            self.num_heads,
            dtype=self.dtype,
            impl=self.attention_impl,
            mesh=self.mesh,
            name="attention",
        )(x)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + h)
        if self.num_experts > 1:
            from pero_pretraining_tpu.models.moe import MoEMlp

            h = MoEMlp(
                self.model_dim,
                self.feedforward_dim,
                self.num_experts,
                topk=self.expert_topk,
                capacity_factor=self.expert_capacity,
                dtype=self.dtype,
                mesh=self.mesh,
                name="moe",
            )(x, train=train)
        else:
            h = Mlp(self.model_dim, self.feedforward_dim, self.dropout, dtype=self.dtype, name="mlp")(x, train=train)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)
        return x


class PipelinedEncoderStack(nn.Module):
    """Encoder block stack in the STACKED layout: one (L, ...) param tree
    ('blocks') instead of block0..blockL-1 submodules.

    Required by pipeline parallelism (parallel/pipeline.py — the leading
    layer axis shards over the `pipe` mesh axis so each chip holds L/P
    blocks); also selectable alone (`stacked_blocks: true`) where the
    lax.scan-over-layers execution compiles one block body instead of L.
    Per-layer numerics are identical to the unstacked loop —
    `parallel/pipeline.py::stack_block_params` converts checkpoints between
    the layouts (tested in tests/test_pipeline_parallel.py).
    """

    num_blocks: int
    model_dim: int
    num_heads: int
    feedforward_dim: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    mesh: Optional[Mesh] = None
    microbatches: int = 0
    remat: bool = False
    # pipe=1 path: fully unroll the layer scan (BackboneConfig.stacked_unroll)
    unroll: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from pero_pretraining_tpu.parallel.mesh import PIPE_AXIS
        from pero_pretraining_tpu.parallel.pipeline import pipeline_apply, sequential_apply

        template = EncoderBlock(
            self.model_dim, self.num_heads, self.feedforward_dim, 0.0,
            dtype=self.dtype, attention_impl=self.attention_impl,
        )

        def init_stacked(rng):
            dummy = jnp.zeros((1, 8, self.model_dim), jnp.float32)
            keys = jax.random.split(rng, self.num_blocks)
            return jax.vmap(lambda k: template.init(k, dummy, False)["params"])(keys)

        stacked = self.param("blocks", init_stacked)
        pipe = self.mesh.shape.get(PIPE_AXIS, 1) if self.mesh is not None else 1
        # during flax init the sample batch may be a single row (not divisible
        # by the data axis) — params are what matters, so trace the
        # numerics-identical sequential path instead of the shard_map loop
        if pipe > 1 and not self.is_initializing():
            m = self.microbatches if self.microbatches > 0 else pipe
            return pipeline_apply(
                template, stacked, x, mesh=self.mesh, microbatches=m, train=train, remat=self.remat
            )
        return sequential_apply(
            template, stacked, x, train, remat=self.remat,
            unroll=self.num_blocks if self.unroll else 1,
        )


class TransformerBackbone(nn.Module):
    """Shared backbone: frontend -> pre-LN -> pos-enc -> encoder blocks.

    Frontend order mirrors the reference (models/transformers.py:82-89): the
    LayerNorm is applied BEFORE the positional encoding is added.
    """

    config: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    mesh: Optional[Mesh] = None

    def frontend(self, x: jax.Array, *, train: bool) -> jax.Array:
        raise NotImplementedError

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        """x: (N, H, W, C) in [0, 1]; mask: (N, W//8) int (1 = replace patch
        with the fixed noise tile). Returns (N, S, D)."""
        cfg = self.config
        if mask is not None:
            tile = jnp.asarray(make_mask_tile(cfg.patch_size[0], cfg.patch_size[1], cfg.in_channels))
            x = apply_patch_mask(x, mask, tile)

        x = x.astype(self.dtype)
        x = self.frontend(x, train=train)  # (N, S, D)

        x = nn.LayerNorm(epsilon=1e-5, name="pre_norm")(x)
        x = PositionalEncoding(cfg.model_dim, cfg.max_len, cfg.random_shift, name="positions")(x, train=train)
        x = self._seq_constraint(x)

        from pero_pretraining_tpu.parallel.mesh import MODEL_AXIS, PIPE_AXIS

        pipe = self.mesh.shape.get(PIPE_AXIS, 1) if self.mesh is not None else 1
        if cfg.stacked_blocks or pipe > 1:
            from pero_pretraining_tpu.parallel.pipeline import validate_pipeline_mesh

            if cfg.num_experts > 1:
                raise ValueError("stacked/pipelined blocks do not support MoE FFNs yet")
            if cfg.dropout > 0:
                raise ValueError("stacked/pipelined blocks require dropout=0")
            if self.mesh is not None and self.mesh.shape.get(MODEL_AXIS, 1) > 1:
                # the stacked-blocks sharding rule (P(pipe) on every leaf,
                # parallel/sharding.py DEFAULT_RULES) replaces the per-layer
                # MODEL_AXIS specs — accepting model>1 here would silently
                # replicate all encoder weights, i.e. the user asks for TP
                # and gets none
                raise ValueError(
                    "the stacked/pipelined block layout does not compose with tensor parallelism "
                    f"(mesh axis 'model'={self.mesh.shape[MODEL_AXIS]} > 1): the stacked "
                    "layout shards the leading layer axis over 'pipe' and drops the "
                    "per-layer model-axis specs; use model=1 with pipe, or the "
                    "unstacked layout with model>1"
                )
            if self.attention_impl == "ring":
                raise ValueError(
                    "ring attention does not compose with stacked/pipelined blocks "
                    "(the pipelined region is manual over `pipe`; use the seq axis without pipe)"
                )
            if pipe > 1:
                validate_pipeline_mesh(self.mesh, cfg.num_blocks, cfg.dropout)
            return PipelinedEncoderStack(
                cfg.num_blocks,
                cfg.model_dim,
                cfg.num_heads,
                cfg.feedforward_dim,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                mesh=self.mesh,
                microbatches=cfg.pipeline_microbatches,
                remat=cfg.remat,
                unroll=cfg.stacked_unroll,
                name="stack",
            )(x, train)

        # optional rematerialization: recompute block activations in backward
        # instead of keeping them in HBM (jax.checkpoint via nn.remat)
        block_cls = nn.remat(EncoderBlock, static_argnums=(2,)) if cfg.remat else EncoderBlock
        for i in range(cfg.num_blocks):
            x = block_cls(
                cfg.model_dim,
                cfg.num_heads,
                cfg.feedforward_dim,
                cfg.dropout,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                mesh=self.mesh,
                num_experts=cfg.num_experts,
                expert_topk=cfg.expert_topk,
                expert_capacity=cfg.expert_capacity,
                name=f"block{i}",
            )(x, train)
        return x

    def _seq_constraint(self, x: jax.Array) -> jax.Array:
        """Pin activations to (data, seq, replicated) sharding when a `seq`
        axis is active, so the pointwise LN/MLP/head work shards over frames
        (GSPMD propagates it through the block stack)."""
        if self.mesh is None:
            return x
        from pero_pretraining_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

        if self.mesh.shape.get(SEQ_AXIS, 1) <= 1:
            return x
        spec = PartitionSpec(DATA_AXIS, SEQ_AXIS, None)
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))


class VisionTransformerEncoder(TransformerBackbone):
    """ViT patchify: one (C*H*8 -> D) matmul per frame (reference:
    models/transformers.py:92-109 uses an equivalent strided Conv2d)."""

    @nn.compact
    def frontend(self, x: jax.Array, *, train: bool) -> jax.Array:
        cfg = self.config
        patches = patchify(x, cfg.patch_size[0], cfg.patch_size[1])
        return nn.Dense(cfg.model_dim, name="patch_embed", dtype=self.dtype)(patches)


class VggTransformerEncoder(TransformerBackbone):
    """VGG conv frontend + height-collapsing aggregation conv (reference:
    models/transformers.py:112-151)."""

    @nn.compact
    def frontend(self, x: jax.Array, *, train: bool) -> jax.Array:
        cfg = self.config
        if cfg.use_pero_vgg:
            x = PeroVggStack(dropout=cfg.dropout, dtype=self.dtype, name="conv_layers")(x, train=train)
        else:
            x = VggEncoderStack(
                base_channels=cfg.base_channels,
                num_conv_blocks=cfg.num_conv_blocks,
                num_conv_layers=(2, 2, 3, 2),
                patch_size=cfg.patch_size,
                dropout=cfg.dropout,
                dtype=self.dtype,
                name="conv_layers",
            )(x, train=train)
        # collapse the remaining height to 1 with a (H', 1) VALID conv
        agg_height = x.shape[1]
        x = nn.Conv(
            cfg.model_dim,
            kernel_size=(agg_height, 1),
            strides=(1, 1),
            padding="VALID",
            name="aggregation",
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return x.squeeze(axis=1)  # (N, 1, S, D) -> (N, S, D)


def build_backbone(
    config: BackboneConfig, *, dtype=jnp.float32, attention_impl: str = "xla", mesh: Optional[Mesh] = None
) -> TransformerBackbone:
    if config.type == "vit":
        return VisionTransformerEncoder(config, dtype=dtype, attention_impl=attention_impl, mesh=mesh)
    if config.type == "vggt":
        return VggTransformerEncoder(config, dtype=dtype, attention_impl=attention_impl, mesh=mesh)
    raise ValueError(f"Unknown backbone type: {config.type}")
