"""FQ/PQ-AE step 3: assign every real frame to its nearest centroid and write
a labels file.

Streams the dataset through the frozen encoder, computes frame -> centroid
assignments with the MXU distance kernel (ops/vq.py — the reference uses
torch.cdist + argmin, produce_kmeans_labels.py:27-87), and writes
`"<id> <l1> <l2> ..."` restricted to image_masks == 1 frames. `--skip`
supports resumable sharded runs (reference: :21).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.ops.vq import vq_assign
from pero_pretraining_tpu.scripts.common import init_dataset, init_feature_model, load_pickle


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint-path", default=None)
    parser.add_argument("--model-definition", default="pero_vgg")
    parser.add_argument("--kmeans-path", required=True, help=".npy centroids or pickle with cluster_centers_.")
    parser.add_argument("--lines-path", required=True)
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--precision", choices=("parity", "fast"), default="parity",
                        help="parity: fp32 matmuls, bit-comparable targets across backends (BASELINE.md). fast: bf16 MXU matmuls, several-x faster; assignments may differ on near-ties.")
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="Shard the frozen-encoder batch over N chips (weights replicated) — label production scales linearly with chips; outputs are row-identical to 1 chip.")
    parser.add_argument("--output", required=True)
    parser.add_argument("--skip", type=int, default=0)
    return parser.parse_args()


def load_centroids(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    obj = load_pickle(path)
    if isinstance(obj, dict):
        return np.asarray(obj["cluster_centers_"])
    return np.asarray(obj.cluster_centers_)  # sklearn estimator


def produce_labels(encode, loader, centroids: jax.Array, output_path: str) -> int:
    assign = jax.jit(lambda frames: vq_assign(frames.reshape(-1, frames.shape[-1]), centroids))
    count = 0
    with open(output_path, "w") as output_file:
        for batch in loader:
            images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
            frames = encode(images)  # (N, S, D)
            labels = np.asarray(assign(frames)).reshape(frames.shape[0], frames.shape[1])
            for line_id, line_mask, line_labels in zip(batch["ids"], batch["image_masks"], labels):
                real = line_labels[line_mask == 1]
                print(line_id, " ".join(str(l) for l in real), file=output_file)
                count += 1
    return count


def main():
    args = parse_arguments()
    # offline targets must stay bit-comparable across backends (BASELINE.md)
    # unless --precision fast trades that for bf16 MXU throughput
    with jax.default_matmul_precision("default" if args.precision == "fast" else "highest"):
        return _main(args)


def _main(args):
    start = time.time()

    mesh = None
    if args.mesh_data > 1:
        import jax as _jax

        from pero_pretraining_tpu.configs import MeshConfig
        from pero_pretraining_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(MeshConfig(data=args.mesh_data), devices=_jax.devices()[: args.mesh_data])
        print(f"Mesh: {dict(mesh.shape)}")
    encode = init_feature_model(args.model_definition, args.checkpoint_path, mesh=mesh)
    print("Model loaded")
    centroids = jnp.asarray(load_centroids(args.kmeans_path), dtype=jnp.float32)
    print(f"K-Means model loaded ({centroids.shape})")
    loader = init_dataset(
        args.lmdb_path, args.lines_path, args.batch_size, skip=args.skip, max_width=args.max_line_width
    )
    print("Dataset loaded")

    count = produce_labels(encode, loader, centroids, args.output)
    print(f"Labels computed ({count})")
    print(f"Time: {time.time() - start:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
