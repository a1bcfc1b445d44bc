"""FQ step 1 / PQ-AE step 1: dump per-frame features from a frozen encoder.

Runs the frozen encoder (PERO VGG transfer model or a trained AE encoder)
over a lines file, keeps only real-content frames (image_masks == 1), stacks
to (total_frames, dim) and saves .npy or pickle (reference:
scripts/produce_features.py:25-78).

    python -m pero_pretraining_tpu.scripts.produce_features \
        --model-definition pero_vgg --checkpoint-path model.msgpack \
        --lines-path lines.trn --lmdb-path images.lmdb --output features.npy
"""

from __future__ import annotations

import argparse

import jax

import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.scripts.common import init_dataset, init_feature_model, save_numpy, save_pickle


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint-path", default=None, help="Path to the model checkpoint (msgpack).")
    parser.add_argument("--model-definition", default="pero_vgg", help='"pero_vgg" or an AE/VQ-VAE JSON definition.')
    parser.add_argument("--lines-path", required=True)
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--precision", choices=("parity", "fast"), default="parity",
                        help="parity: fp32 matmuls, bit-comparable targets across backends (BASELINE.md). fast: bf16 MXU matmuls, several-x faster; assignments may differ on near-ties.")
    parser.add_argument("--output-type", default="numpy", choices=["numpy", "pickle"])
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="Shard the frozen-encoder batch over N chips (weights replicated) — feature dumping scales linearly with chips; outputs are row-identical to 1 chip.")
    parser.add_argument("--output", required=True)
    return parser.parse_args()


def compute_features(encode, loader) -> np.ndarray:
    all_features = []
    for batch in loader:
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        frames = np.asarray(encode(images), dtype=np.float32)  # (N, S, D)
        all_features.append(frames[batch["image_masks"] == 1])
    return np.vstack(all_features)


def main():
    args = parse_arguments()
    # offline targets must stay bit-comparable across backends (BASELINE.md)
    # unless --precision fast trades that for bf16 MXU throughput
    with jax.default_matmul_precision("default" if args.precision == "fast" else "highest"):
        return _main(args)


def _main(args):

    mesh = None
    if args.mesh_data > 1:
        import jax as _jax

        from pero_pretraining_tpu.configs import MeshConfig
        from pero_pretraining_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(MeshConfig(data=args.mesh_data), devices=_jax.devices()[: args.mesh_data])
        print(f"Mesh: {dict(mesh.shape)}")
    encode = init_feature_model(args.model_definition, args.checkpoint_path, mesh=mesh)
    print("Model loaded")
    loader = init_dataset(args.lmdb_path, args.lines_path, args.batch_size, max_width=args.max_line_width)
    print("Dataset loaded")

    features = compute_features(encode, loader)
    print(f"Features computed ({features.shape})")

    if args.output_type == "numpy":
        save_numpy(features, args.output)
    else:
        save_pickle(features, args.output)
    print(f"Features saved to {args.output} ({args.output_type})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
