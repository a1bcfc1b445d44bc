"""Import torch checkpoints from the reference ecosystem.

Converts torch state_dicts into this framework's param trees so users can:
- bring PERO-OCR production VGG weights into `PeroVggEncoder` /
  `VggTransformerEncoder` (the reference's transfer-learning path,
  models/helpers.py:133-173),
- port reference-trained ViT/VggT models (reference: models/transformers.py)
  for parity testing or continued training.

Layout conventions translated:
- Linear: torch (out, in) -> flax kernel (in, out)
- Conv2d: torch (O, I, kh, kw) -> flax NHWC kernel (kh, kw, I, O)
- MultiheadAttention packed in_proj [q;k;v] -> fused qkv Dense (the head-major
  output ordering matches our (3, H, head_dim) reshape)
- BatchNorm running stats -> the `batch_stats` collection
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear_params(weight, bias) -> Dict[str, np.ndarray]:
    return {"kernel": _t(weight).T, "bias": _t(bias)}


def conv_params(weight, bias) -> Dict[str, np.ndarray]:
    return {"kernel": _t(weight).transpose(2, 3, 1, 0), "bias": _t(bias)}


def layernorm_params(weight, bias) -> Dict[str, np.ndarray]:
    return {"scale": _t(weight), "bias": _t(bias)}


def batchnorm_params(weight, bias, running_mean, running_var) -> Tuple[Dict, Dict]:
    return (
        {"scale": _t(weight), "bias": _t(bias)},
        {"mean": _t(running_mean), "var": _t(running_var)},
    )


def convert_torch_encoder_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """One torch.nn.TransformerEncoderLayer -> one EncoderBlock param subtree."""
    return {
        "attention": {
            "qkv": linear_params(sd[f"{prefix}self_attn.in_proj_weight"], sd[f"{prefix}self_attn.in_proj_bias"]),
            "out": linear_params(sd[f"{prefix}self_attn.out_proj.weight"], sd[f"{prefix}self_attn.out_proj.bias"]),
        },
        "mlp": {
            "fc1": linear_params(sd[f"{prefix}linear1.weight"], sd[f"{prefix}linear1.bias"]),
            "fc2": linear_params(sd[f"{prefix}linear2.weight"], sd[f"{prefix}linear2.bias"]),
        },
        "norm1": layernorm_params(sd[f"{prefix}norm1.weight"], sd[f"{prefix}norm1.bias"]),
        "norm2": layernorm_params(sd[f"{prefix}norm2.weight"], sd[f"{prefix}norm2.bias"]),
    }


def convert_vit_backbone(sd: Dict[str, Any], num_blocks: int = 6) -> Dict[str, Any]:
    """Reference VisionTransformerEncoder state_dict -> VisionTransformerEncoder
    params. Expects reference key names: conv_layer.*, intermediate_norm.*,
    encoder_layers.layers.N.* (reference: models/transformers.py:92-109)."""
    d_out = _t(sd["conv_layer.weight"]).shape[0]
    params: Dict[str, Any] = {
        # Conv2d k=stride=(H, 8) == patchify matmul with torch flatten order
        "patch_embed": {
            "kernel": _t(sd["conv_layer.weight"]).reshape(d_out, -1).T,
            "bias": _t(sd["conv_layer.bias"]),
        },
        "pre_norm": layernorm_params(sd["intermediate_norm.weight"], sd["intermediate_norm.bias"]),
    }
    for i in range(num_blocks):
        params[f"block{i}"] = convert_torch_encoder_layer(sd, f"encoder_layers.layers.{i}.")
    return params


def convert_pero_vgg_stack(sd: Dict[str, Any], prefix: str = "") -> Tuple[Dict, Dict]:
    """PERO conv stack state_dict -> (PeroVggStack params, batch_stats).

    Works for any of the reference's key spellings (plain Sequential indices
    or the nested encoder_frontend wrappers) by consuming conv/bn tensors in
    order — the channel plan 64-64/128-128/256-256-256/512-512 is fixed
    (reference: models/helpers.py:97-130)."""
    convs = []
    bn = None
    ordered = [(k, v) for k, v in sd.items() if k.startswith(prefix)]
    for key, value in ordered:
        arr = _t(value)
        if key.endswith(".weight") and arr.ndim == 4:
            bias = sd[key[: -len(".weight")] + ".bias"]
            convs.append(conv_params(value, bias))
        elif key.endswith(".running_mean"):
            stem = key[: -len(".running_mean")]
            bn = batchnorm_params(
                sd[stem + ".weight"], sd[stem + ".bias"], value, sd[stem + ".running_var"]
            )
    plan = [2, 2, 3, 2]  # convs per block
    expected = sum(plan)
    if len(convs) < expected:
        raise ValueError(f"expected >= {expected} convs under '{prefix}', found {len(convs)}")

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    idx = 0
    for b, n in enumerate(plan):
        for j in range(n):
            params[f"block{b}_conv{j}"] = convs[idx]
            idx += 1
    if bn is not None:
        params["bn"], stats["bn"] = bn
    aggregation = convs[idx] if idx < len(convs) else None
    if aggregation is not None:
        params["__aggregation__"] = aggregation  # caller decides where it goes
    return params, stats


def convert_pero_vgg_encoder(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Full create_pero_vgg_encoder checkpoint -> PeroVggEncoder variables
    (params, batch_stats)."""
    stack_params, stack_stats = convert_pero_vgg_stack(sd)
    aggregation = stack_params.pop("__aggregation__", None)
    params = {"blocks_2d": stack_params}
    stats = {"blocks_2d": stack_stats} if stack_stats else {}
    if aggregation is not None:
        params["aggregation_conv"] = aggregation
    return params, stats
