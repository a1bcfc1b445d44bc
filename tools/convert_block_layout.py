"""Convert a checkpoint's encoder-block params between the per-block layout
(block0..blockL-1 submodules — the default) and the STACKED layout (one
(L, ...) 'stack/blocks' tree — required by pipeline parallelism and the
scan-over-layers fast-compile path, parallel/pipeline.py).

Works on full train-state checkpoints and params-only exports; optimizer
moments are dropped (their tree must match the new layout — resume re-inits
Adam, exactly like the reference's params-only checkpoints, reference:
masked_pretraining/model.py:65-69).

Usage:
  python -m tools.convert_block_layout --input ckpt.msgpack --output out.msgpack --to stacked
  python -m tools.convert_block_layout --input ckpt.msgpack --output out.msgpack --to blocks
"""

from __future__ import annotations

import argparse
import os
import re

from flax import serialization

from pero_pretraining_tpu.scripts.common import load_checkpoint_tree, split_variables


def convert_params(params: dict, to: str) -> dict:
    """Convert the 'backbone' subtree's block layout in place (pure dict in /
    out; tensors stay numpy — no device involvement)."""
    import numpy as np

    backbone = dict(params.get("backbone", params))
    block_keys = sorted(
        (k for k in backbone if re.fullmatch(r"block\d+", k)), key=lambda k: int(k[5:])
    )

    if to == "stacked":
        if not block_keys:
            if "stack" in backbone:
                raise SystemExit("checkpoint is already in the stacked layout")
            raise SystemExit("no block0..N params found — not a transformer backbone checkpoint?")
        import jax

        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *[backbone[k] for k in block_keys])
        for k in block_keys:
            del backbone[k]
        backbone["stack"] = {"blocks": stacked}
    elif to == "blocks":
        if "stack" not in backbone:
            if block_keys:
                raise SystemExit("checkpoint is already in the per-block layout")
            raise SystemExit("no stack/blocks params found — not a stacked checkpoint?")
        import jax

        stacked = backbone.pop("stack")["blocks"]
        num_blocks = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for i in range(num_blocks):
            backbone[f"block{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    else:
        raise SystemExit(f"unknown target layout: {to}")

    if "backbone" in params:
        out = dict(params)
        out["backbone"] = backbone
        return out
    return backbone


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--to", choices=("stacked", "blocks"), required=True)
    args = parser.parse_args()

    raw = load_checkpoint_tree(args.input)
    params, model_state = split_variables(raw)
    params = convert_params(dict(params), args.to)

    out = {"params": params}
    for key, value in (model_state or {}).items():
        out[key] = value
    if "step" in raw:
        out["step"] = raw["step"]

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote {args.output} ({args.to} layout)")


if __name__ == "__main__":
    main()
