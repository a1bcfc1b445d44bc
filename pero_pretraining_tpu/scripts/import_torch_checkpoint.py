"""Convert a torch checkpoint from the reference ecosystem to this
framework's msgpack params.

Supports:
- reference-architecture ViT backbones (state_dict with conv_layer /
  intermediate_norm / encoder_layers.* keys — reference
  models/transformers.py:92-109),
- PERO-OCR production VGG encoders (create_pero_vgg_encoder checkpoints,
  models/helpers.py:133-173) for the Feature-Quantization transfer path.

    python -m pero_pretraining_tpu.scripts.import_torch_checkpoint \
        --input pero_vgg.pth --kind pero_vgg --output pero_vgg.msgpack
"""

from __future__ import annotations

import argparse

import jax
from flax import serialization


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="torch .pth state_dict")
    parser.add_argument("--kind", required=True, choices=("vit", "pero_vgg"))
    parser.add_argument("--num-blocks", type=int, default=6, help="Transformer blocks (vit only).")
    parser.add_argument("--key-prefix", default="", help="Strip this prefix from state_dict keys.")
    parser.add_argument("--output", required=True, help="Output msgpack path.")
    return parser.parse_args()


def main():
    import torch

    from pero_pretraining_tpu.utils.torch_import import convert_pero_vgg_encoder, convert_vit_backbone

    args = parse_arguments()
    sd = torch.load(args.input, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if args.key_prefix:
        sd = {k[len(args.key_prefix):]: v for k, v in sd.items() if k.startswith(args.key_prefix)}
    print(f"Loaded {len(sd)} tensors from {args.input}")

    if args.kind == "vit":
        params = convert_vit_backbone(sd, num_blocks=args.num_blocks)
        variables = {"params": {"backbone": params}}
    else:
        params, stats = convert_pero_vgg_encoder(sd)
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats

    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    leaves = len(jax.tree_util.tree_leaves(variables))
    print(f"Wrote {leaves} arrays to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
