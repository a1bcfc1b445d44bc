from pero_pretraining_tpu.models.positional import sincos_position_table, PositionalEncoding
from pero_pretraining_tpu.models.transformer import (
    TransformerBackbone,
    VisionTransformerEncoder,
    VggTransformerEncoder,
    build_backbone,
)
from pero_pretraining_tpu.models.heads import LinearHead, MLPHead, build_head
from pero_pretraining_tpu.models.moe import MoEMlp

__all__ = [
    "MoEMlp",
    "sincos_position_table",
    "PositionalEncoding",
    "TransformerBackbone",
    "VisionTransformerEncoder",
    "VggTransformerEncoder",
    "build_backbone",
    "LinearHead",
    "MLPHead",
    "build_head",
]
