from pero_pretraining_tpu.ops.masking import (
    apply_patch_mask,
    make_mask_tile,
    sample_patch_mask,
)
from pero_pretraining_tpu.ops.patchify import patchify
from pero_pretraining_tpu.ops.attention import multi_head_attention

__all__ = [
    "apply_patch_mask",
    "make_mask_tile",
    "sample_patch_mask",
    "patchify",
    "multi_head_attention",
]
