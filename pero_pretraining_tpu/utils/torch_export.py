"""Export trained params to torch checkpoints for the reference ecosystem.

The inverse of utils/torch_import.py: models pretrained/fine-tuned HERE can
be loaded by the reference code and PERO-OCR production (which consume raw
torch state_dicts — reference masked_pretraining/model.py:65-69,
scripts/common.py:11-24 with strict=False). Key layouts exported:

- ViT backbone -> reference `VisionTransformerEncoder` names
  (conv_layer.*, intermediate_norm.*, encoder_layers.layers.N.* —
  reference models/transformers.py:92-109; `pe`/`mask_pattern` are
  non-persistent in the reference so they're regenerated on load),
- PERO VGG encoder -> `create_pero_vgg_encoder` nesting
  (encoder_frontend.blocks_2d.blocks_2d.{idx} Sequential indices,
  reference models/helpers.py:97-173),
- masked model (backbone + linear head) -> `MaskedTransformerEncoder`
  state_dict ("backbone.*" + "head.linear.*", reference
  masked_pretraining/model.py:33-69).

All outputs are numpy dicts; the CLI (scripts/export_torch_checkpoint.py)
wraps them in torch tensors and torch.save.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _a(x) -> np.ndarray:
    return np.asarray(x)


def linear_to_torch(p: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str) -> None:
    out[f"{prefix}.weight"] = _a(p["kernel"]).T
    out[f"{prefix}.bias"] = _a(p["bias"])


def conv_to_torch(p: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str) -> None:
    # flax NHWC kernel (kh, kw, I, O) -> torch (O, I, kh, kw)
    out[f"{prefix}.weight"] = _a(p["kernel"]).transpose(3, 2, 0, 1)
    out[f"{prefix}.bias"] = _a(p["bias"])


def layernorm_to_torch(p: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str) -> None:
    out[f"{prefix}.weight"] = _a(p["scale"])
    out[f"{prefix}.bias"] = _a(p["bias"])


def batchnorm_to_torch(p: Dict[str, Any], stats: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str) -> None:
    out[f"{prefix}.weight"] = _a(p["scale"])
    out[f"{prefix}.bias"] = _a(p["bias"])
    out[f"{prefix}.running_mean"] = _a(stats["mean"])
    out[f"{prefix}.running_var"] = _a(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_encoder_block(block: Dict[str, Any], out: Dict[str, np.ndarray], prefix: str) -> None:
    """EncoderBlock params -> torch.nn.TransformerEncoderLayer keys."""
    qkv = block["attention"]["qkv"]
    out[f"{prefix}self_attn.in_proj_weight"] = _a(qkv["kernel"]).T
    out[f"{prefix}self_attn.in_proj_bias"] = _a(qkv["bias"])
    linear_to_torch(block["attention"]["out"], out, f"{prefix}self_attn.out_proj")
    linear_to_torch(block["mlp"]["fc1"], out, f"{prefix}linear1")
    linear_to_torch(block["mlp"]["fc2"], out, f"{prefix}linear2")
    layernorm_to_torch(block["norm1"], out, f"{prefix}norm1")
    layernorm_to_torch(block["norm2"], out, f"{prefix}norm2")


def export_vit_backbone(
    params: Dict[str, Any],
    patch_size: Tuple[int, int] = (40, 8),
    in_channels: int = 3,
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """VisionTransformerEncoder params -> reference state_dict."""
    out: Dict[str, np.ndarray] = {}
    kernel = _a(params["patch_embed"]["kernel"])  # (in*kh*kw torch-order, D)
    d_out = kernel.shape[1]
    out[f"{prefix}conv_layer.weight"] = kernel.T.reshape(d_out, in_channels, *patch_size)
    out[f"{prefix}conv_layer.bias"] = _a(params["patch_embed"]["bias"])
    layernorm_to_torch(params["pre_norm"], out, f"{prefix}intermediate_norm")
    if "stack" in params:  # stacked-blocks layout (parallel/pipeline.py)
        from pero_pretraining_tpu.parallel.pipeline import unstack_block_params

        import jax

        stacked = params["stack"]["blocks"]
        num_blocks = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for i, block in enumerate(unstack_block_params(stacked, num_blocks)):
            export_encoder_block(block, out, f"{prefix}encoder_layers.layers.{i}.")
        return out
    i = 0
    while f"block{i}" in params:
        export_encoder_block(params[f"block{i}"], out, f"{prefix}encoder_layers.layers.{i}.")
        i += 1
    return out


# Sequential indices of the convs in create_pero_vgg_layers
# (reference models/helpers.py:100-129): blocks 0..3, nested Sequential at 20
_PERO_CONV_KEYS = {
    "block0_conv0": "0", "block0_conv1": "2",
    "block1_conv0": "6", "block1_conv1": "8",
    "block2_conv0": "12", "block2_conv1": "14", "block2_conv2": "16",
    "block3_conv0": "20.0", "block3_conv1": "20.2",
}


def export_pero_vgg_encoder(
    params: Dict[str, Any], batch_stats: Optional[Dict[str, Any]] = None
) -> Dict[str, np.ndarray]:
    """PeroVggEncoder variables -> create_pero_vgg_encoder state_dict."""
    out: Dict[str, np.ndarray] = {}
    stack = params["blocks_2d"]
    base = "encoder_frontend.blocks_2d.blocks_2d"
    for name, idx in _PERO_CONV_KEYS.items():
        conv_to_torch(stack[name], out, f"{base}.{idx}")
    if "bn" in stack:
        stats = (batch_stats or {}).get("blocks_2d", {}).get("bn")
        if stats is None:
            stats = {"mean": np.zeros_like(_a(stack["bn"]["scale"])),
                     "var": np.ones_like(_a(stack["bn"]["scale"]))}
        batchnorm_to_torch(stack["bn"], stats, out, f"{base}.21")
    if "aggregation_conv" in params:
        conv_to_torch(params["aggregation_conv"], out, "encoder_frontend.aggregation_conv.0")
    return out


def export_ctc_model(
    params: Dict[str, Any],
    patch_size: Tuple[int, int] = (40, 8),
    in_channels: int = 3,
) -> Dict[str, np.ndarray]:
    """CTCModel params (ViT backbone + ctc_head Dense) -> reference-style
    state_dict (backbone.* + head.linear.*). Structurally identical to the
    reference MaskedTransformerEncoder with out_features == charset size
    (incl. blank at index 0), so fine-tuned recognizers deploy into torch
    consumers that compute per-frame logits for CTC decoding."""
    out = export_vit_backbone(params["backbone"], patch_size, in_channels, prefix="backbone.")
    linear_to_torch(params["ctc_head"], out, "head.linear")
    return out


def export_masked_model(
    params: Dict[str, Any],
    patch_size: Tuple[int, int] = (40, 8),
    in_channels: int = 3,
) -> Dict[str, np.ndarray]:
    """MaskedPretrainingModel params (ViT backbone + linear head) ->
    reference MaskedTransformerEncoder state_dict."""
    out = export_vit_backbone(params["backbone"], patch_size, in_channels, prefix="backbone.")
    linear_to_torch(params["head"]["linear"], out, "head.linear")
    return out
