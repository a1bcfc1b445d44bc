"""VQ-VAE targets: run a trained VQ-VAE's encoder + quantizer over a lines
file and write the code indices as a labels file.

(reference: scripts/produce_vqvae_labels.py:27-72, with its --labels-path /
args.output mismatch fixed.)
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.configs import AutoencoderConfig
from pero_pretraining_tpu.models.autoencoders import build_autoencoder
from pero_pretraining_tpu.scripts.common import init_dataset, load_checkpoint_tree, save_labels, split_variables


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lines-path", required=True)
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--model", required=True, help="VQ-VAE JSON definition.")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--checkpoint-path", required=True)
    parser.add_argument("--precision", choices=("parity", "fast"), default="parity",
                        help="parity: fp32 matmuls, bit-comparable targets across backends (BASELINE.md). fast: bf16 MXU matmuls, several-x faster; assignments may differ on near-ties.")
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="Shard the encoder+quantizer batch over N chips (weights replicated) — "
                             "label production scales linearly; outputs are row-identical to 1 chip.")
    parser.add_argument("--labels-path", required=True, help="Output labels file.")
    return parser.parse_args()


def compute_labels(model, variables, loader, mesh=None):
    @jax.jit
    def quantize(variables, images):
        features = model.apply(variables, images, train=False, method=model.encode)
        _, labels, _, _ = model.apply(variables, features, train=False, method=model.quantize)
        n, _, s, _ = features.shape
        return labels.reshape(n, s)

    data_size = 1
    if mesh is not None:
        from pero_pretraining_tpu.parallel.mesh import DATA_AXIS
        from pero_pretraining_tpu.parallel.sharding import batch_sharding, replicated

        data_size = mesh.shape[DATA_AXIS]
        variables = jax.device_put(variables, replicated(mesh))
    else:
        variables = jax.device_put(variables)
    data = {}
    for batch in loader:
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        n = images.shape[0]
        if data_size > 1:
            pad = (-n) % data_size
            if pad:
                images = jnp.concatenate(
                    [images, jnp.zeros((pad,) + tuple(images.shape[1:]), images.dtype)], axis=0
                )
            images = jax.device_put(images, batch_sharding(mesh))
        labels = np.asarray(quantize(variables, images))[:n]
        for line_id, line_mask, line_labels in zip(batch["ids"], batch["image_masks"], labels):
            data[line_id] = line_labels[line_mask == 1].tolist()
    return data


def main():
    args = parse_arguments()
    # offline targets must stay bit-comparable across backends (BASELINE.md)
    # unless --precision fast trades that for bf16 MXU throughput
    with jax.default_matmul_precision("default" if args.precision == "fast" else "highest"):
        return _main(args)


def _main(args):

    config = AutoencoderConfig.from_definition(json.loads(args.model))
    model = build_autoencoder(config)
    params, model_state = split_variables(load_checkpoint_tree(args.checkpoint_path))
    variables = {"params": params, **model_state}
    print("Model loaded")

    loader = init_dataset(args.lmdb_path, args.lines_path, args.batch_size, max_width=args.max_line_width)
    print("Dataset loaded")

    mesh = None
    if args.mesh_data > 1:
        from pero_pretraining_tpu.configs import MeshConfig
        from pero_pretraining_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(MeshConfig(data=args.mesh_data), devices=jax.devices()[: args.mesh_data])
        print(f"Mesh: {dict(mesh.shape)}")
    labels = compute_labels(model, variables, loader, mesh=mesh)
    print(f"Labels computed ({len(labels)})")

    save_labels(labels, args.labels_path)
    print(f"Labels saved to {args.labels_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
