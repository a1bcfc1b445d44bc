"""Export a framework checkpoint to a torch .pth for the reference ecosystem.

Inverse of import_torch_checkpoint: models pretrained here load into the
reference code / PERO-OCR production (raw state_dict consumers — reference
masked_pretraining/model.py:65-69).

    python -m pero_pretraining_tpu.scripts.export_torch_checkpoint \
        --input ckpt/checkpoint_100000.msgpack --kind masked_vit \
        --output model.pth

Kinds: vit (backbone only), pero_vgg (frozen-encoder FQ path),
masked_vit (backbone + linear head, reference MaskedTransformerEncoder),
ctc_vit (fine-tuned CTC recognizer: backbone + charset head).
"""

from __future__ import annotations

import argparse


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="msgpack checkpoint (train state or variables)")
    parser.add_argument("--kind", required=True, choices=("vit", "pero_vgg", "masked_vit", "ctc_vit"))
    parser.add_argument("--patch-height", type=int, default=40)
    parser.add_argument("--patch-width", type=int, default=8)
    parser.add_argument("--output", required=True, help="Output .pth path")
    return parser.parse_args()


def main():
    import torch

    from pero_pretraining_tpu.scripts.common import load_checkpoint_tree, split_variables
    from pero_pretraining_tpu.utils.torch_export import (
        export_ctc_model,
        export_masked_model,
        export_pero_vgg_encoder,
        export_vit_backbone,
    )

    args = parse_arguments()
    params, model_state = split_variables(load_checkpoint_tree(args.input))
    print(f"Loaded checkpoint {args.input}")

    patch = (args.patch_height, args.patch_width)
    if args.kind == "vit":
        backbone = params.get("backbone", params)
        sd = export_vit_backbone(backbone, patch_size=patch)
    elif args.kind == "pero_vgg":
        sd = export_pero_vgg_encoder(params, model_state.get("batch_stats"))
    elif args.kind == "ctc_vit":
        sd = export_ctc_model(params, patch_size=patch)
    else:
        sd = export_masked_model(params, patch_size=patch)

    torch_sd = {k: torch.tensor(v) for k, v in sd.items()}
    torch.save(torch_sd, args.output)
    print(f"Wrote {len(torch_sd)} tensors -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
