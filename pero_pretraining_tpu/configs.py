"""Typed configuration for the whole framework.

The reference configures models via JSON strings on the CLI splatted into
constructors (reference: masked_pretraining/train.py:41-42, model.py:7-30).
Here every knob lives in a dataclass; `from_definition` accepts the same JSON
dict shape as the reference so CLI surfaces stay compatible.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _filter_kwargs(cls, definition: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in definition.items() if k in names}


@dataclass(frozen=True)
class BackboneConfig:
    """Transformer backbone knobs (reference: models/transformers.py:11-12).

    `type` is "vit" (single-matmul patchify) or "vggt" (VGG conv frontend).
    One output frame per `patch_size[1]` = 8 px of width.
    """

    type: str = "vit"
    height: int = 40
    patch_size: Tuple[int, int] = (40, 8)
    in_channels: int = 3
    model_dim: int = 512
    num_heads: int = 4
    num_blocks: int = 6
    feedforward_dim: int = 2048
    dropout: float = 0.0
    max_len: int = 4096
    # PositionalEncoding knobs (reference: models/transformers.py:154-192)
    random_shift: bool = True
    # rematerialize encoder blocks in backward (trade FLOPs for HBM)
    remat: bool = False
    # VggTransformerEncoder knobs (reference: models/transformers.py:112-144)
    base_channels: int = 64
    num_conv_blocks: int = 4
    use_pero_vgg: bool = True
    # Mixture-of-Experts FFN (models/moe.py; 0 = dense reference FFN).
    # Experts shard over the `expert` mesh axis (expert parallelism); the
    # Switch load-balance aux loss is weighted by router_aux_weight.
    num_experts: int = 0
    expert_topk: int = 1
    expert_capacity: float = 1.25
    router_aux_weight: float = 0.01
    # stacked-blocks layout (one (L, ...) param tree instead of block0..L-1):
    # required by pipeline parallelism, selectable alone for fast compiles;
    # pipeline_microbatches=0 means "use the pipe axis size"
    stacked_blocks: bool = False
    pipeline_microbatches: int = 0
    # pipe=1 stacked execution: fully unroll the layer scan (recovers XLA's
    # cross-layer fusion, measured +34% over the rolled scan on the flagship,
    # -11% vs unstacked — docs/bench_overheads.json); False = rolled scan
    # for fast compiles
    stacked_unroll: bool = True

    @classmethod
    def from_definition(cls, definition: dict) -> "BackboneConfig":
        d = dict(definition)
        if "patch_size" in d:
            d["patch_size"] = tuple(d["patch_size"])
        return cls(**_filter_kwargs(cls, d))

    @property
    def subsampling(self) -> int:
        return self.patch_size[1]


@dataclass(frozen=True)
class HeadConfig:
    """Projection head (reference: masked_pretraining/model.py:98-105,
    joint_embedding_pretraining/model.py:69-115)."""

    type: str = "linear"  # "linear" | "mlp"
    in_features: int = 512
    out_features: int = 4096
    # MLP-head knobs
    hidden_dim: int = 8192
    num_layers: int = 3
    use_bn: bool = False

    @classmethod
    def from_definition(cls, definition: dict) -> "HeadConfig":
        d = dict(definition)
        # the reference MLPHead uses in_dim / hidden_dim naming
        if "in_dim" in d:
            d["in_features"] = d.pop("in_dim")
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class VQConfig:
    """VQ-VAE quantizer (reference: models/autoencoders.py:108-241)."""

    num_embeddings: int = 1024
    embeddings_dim: int = 512
    commitment_cost: float = 0.25
    decay: float = 0.99  # decay > 0 selects EMA codebook updates
    epsilon: float = 1e-5
    # dead-code restarts: re-seed codes whose EMA cluster size drops below
    # this absolute threshold from random encoder outputs (0.0 = off, the
    # reference-faithful default). Fixes codebook collapse — the failure the
    # reference's utilization-reporting TODO (autoencoders/train.py:114)
    # never got to diagnosing.
    restart_threshold: float = 0.0
    restart_seed: int = 0
    # initialize the codebook from (jittered) encoder outputs of the init
    # batch instead of normal(1.0) — removes the init-scale mismatch that
    # drives early codebook collapse (see VectorQuantizer.data_init)
    data_init: bool = False


@dataclass(frozen=True)
class AutoencoderConfig:
    """AE / VQ-VAE tokenizer models (reference: models/autoencoders.py:6-80,
    autoencoders/model.py:3-19)."""

    type: str = "vqvae"  # "ae" | "vqvae"
    height: int = 40
    patch_size: Tuple[int, int] = (40, 8)
    in_channels: int = 3
    base_channels: int = 64
    num_conv_blocks: int = 3
    num_conv_layers: Tuple[int, ...] = (2, 2, 3)
    decoder_base_channels: int = 256
    decoder_num_conv_layers: Tuple[int, ...] = (3, 2, 2)
    dropout: float = 0.0
    reconstruction_loss: str = "mse"  # "mse"/"l2" | "l1"/"mae"
    vq: VQConfig = field(default_factory=VQConfig)

    @classmethod
    def from_definition(cls, definition: dict) -> "AutoencoderConfig":
        d = dict(definition)
        vq_kwargs = _filter_kwargs(VQConfig, d)
        if vq_kwargs:
            d["vq"] = VQConfig(**vq_kwargs)
        for key in ("patch_size", "num_conv_layers", "decoder_num_conv_layers"):
            if key in d:
                d[key] = tuple(d[key])
        return cls(**_filter_kwargs(cls, d))

    @property
    def encoder_out_channels(self) -> int:
        # reference: models/autoencoders.py:32
        return self.base_channels * (2 ** (self.num_conv_blocks - 1))


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. `data` carries batch parallelism (gradient psum over ICI),
    `model` carries tensor parallelism (attention heads / FFN hidden), `seq`
    carries sequence (context) parallelism: activations shard over the frame
    axis and attention runs as a shard_map ring (parallel/ring.py)."""

    data: int = -1  # -1: use all devices not claimed by the other axes
    model: int = 1
    seq: int = 1
    # GPipe pipeline parallelism over the encoder block stack
    # (parallel/pipeline.py): stages hold num_blocks/pipe consecutive blocks
    pipe: int = 1
    # expert parallelism for MoE FFNs (models/moe.py): stacked expert weights
    # shard over `expert` and GSPMD inserts the token all-to-all
    expert: int = 1


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline (reference: common/dataset.py:12, common/dataloader.py:23).

    Unlike the reference's pad-to-max-in-batch, widths here are static:
    every batch is `max_width` pixels wide (XLA requires fixed shapes and this
    avoids re-compilation). Lines are placed with random left padding inside
    the fixed canvas, exactly mirroring the reference's mask semantics.
    """

    lmdb_path: str = ""
    trn_path: str = ""
    tst_path: str = ""
    batch_size: int = 16
    max_width: int = 2048
    label_step: int = 8
    subsampling_factor: int = 8
    padding_coefficient: int = 32
    fill_width: bool = False
    exact_width: bool = False
    pair_images: bool = False
    crop_width: Optional[int] = None
    crop_step: int = 1
    same_left_paddings: bool = False
    augmentations: Optional[str] = None
    left_align: bool = False
    # optional width buckets (e.g. (512, 1024, 2048)): one compiled
    # program per bucket instead of padding everything to max_width
    buckets: Optional[Tuple[int, ...]] = None
    num_workers: int = 4
    prefetch: int = 2
    shuffle: bool = True
    seed: int = 0


@dataclass(frozen=True)
class TrainingConfig:
    """Optimization harness (reference: masked_pretraining/train.py:23-56)."""

    learning_rate: float = 2e-4
    warmup_iterations: int = 10000
    warmup_polynomial_order: int = 1
    # LR schedule after warmup: "constant" (reference behavior) or "cosine"
    # decay to min_lr_fraction * learning_rate at end_iteration
    schedule: str = "constant"
    min_lr_fraction: float = 0.0
    # AdamW decoupled weight decay (0 = plain Adam, the reference optimizer)
    weight_decay: float = 0.0
    # global-norm gradient clipping (0 = off)
    grad_clip: float = 0.0
    # LR multiplier for params under the top-level 'backbone' subtree
    # (fine-tuning: protect pretrained features while the fresh head adapts)
    backbone_lr_scale: float = 1.0
    # N > 0: skip (zero) optimizer updates when grads are non-finite; the
    # Trainer aborts loudly after N consecutive skipped steps; 0 = off
    skip_nonfinite: int = 0
    # Adam moment storage. Default "float32": the reference's plain torch
    # Adam numerics. "bfloat16" halves the optimizer-state HBM traffic (the
    # fused Adam update is ~1/3 of the flagship step at HBM roofline —
    # docs/PROFILE.md; +5.3% wall / -0.11 ms device measured) and is the
    # recommended OPT-IN for long pretraining runs, where a 1000-step
    # flagship A/B measured parity (final-loss gap 0.01% relative,
    # docs/bench_moments_parity.json). It was the shipped default for one
    # round (r4) and was REVERTED in r5: at study scale the budgeted CTC
    # fine-tune measured +1.15 CER points under bf16 moments (0.0652/0.0655
    # vs fp32's 0.0538/0.0539 over 2 seeds — docs/RENDERED_EXPERIMENT.md),
    # so the quality-first reference numerics are the default and the
    # throughput path is explicit. "int8" = blockwise-quantized moments, 4x
    # less traffic (trainer.py::scale_by_adam_8bit; structurally different
    # opt-state — cross-dtype resume fails loudly either way, checkpoint.py).
    moments_dtype: str = "float32"
    # ZeRO-1: partition optimizer state (Adam moments) over the `data` mesh
    # axis — GSPMD reduce-scatters grads into the update and all-gathers the
    # param deltas; per-chip optimizer HBM traffic divides by the data size
    # (the fused Adam update runs at HBM roofline, docs/PROFILE.md). No effect
    # on a 1-device data axis.
    shard_opt_state: bool = False
    # ZeRO-3 / FSDP: fully shard PARAMS over `data` (GSPMD all-gathers each
    # weight just-in-time and reduce-scatters its grad); per-chip parameter
    # residency divides by the data size. Optimizer moments inherit the
    # sharded layout. Composes with --shard-opt-state and the other axes.
    fsdp: bool = False
    start_iteration: int = 0
    end_iteration: int = 100000
    view_step: int = 500
    batch_size: int = 16
    bfloat16: bool = False
    masking_prob: float = 0.15
    masking_mode: str = "iid"  # "iid" | "span"
    # autoencoder pipeline: corrupt the input on device (noise std up to this
    # value in [0,1] pixel scale + brightness/contrast jitter) while
    # reconstructing the CLEAN image — a denoising AE whose features (and
    # therefore PQ-AE/VQ codes) become degradation-invariant. 0 = plain AE.
    denoising: float = 0.0
    span_length: int = 3
    unmasked_weight: Optional[float] = None
    device_augment: bool = False
    # fuse the linear head into the CE (logits never materialize; ops/fused_ce.py)
    fused_ce: bool = False
    # microbatch gradient accumulation: batch is split into grad_accum
    # leading-dim slices scanned inside the jitted step (one optimizer update)
    grad_accum: int = 1
    checkpoints_dir: Optional[str] = None
    visualizations_dir: Optional[str] = None
    seed: int = 0
    donate_state: bool = True


@dataclass(frozen=True)
class ExperimentConfig:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)


def parse_json_definition(text: str) -> dict:
    """CLI compatibility: the reference passes model definitions as JSON strings
    (reference: masked_pretraining/train.py:41-42)."""
    if not text:
        return {}
    return json.loads(text)
