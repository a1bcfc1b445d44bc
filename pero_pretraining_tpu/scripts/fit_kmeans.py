"""FQ/PQ-AE step 2: fit minibatch k-means over dumped features.

Default k=4096 matches the masked head's vocabulary (reference:
scripts/fit_kmeans.py:11-32). Two backends:

- "jax" (default): TPU minibatch k-means with k-means++ seeding
  (ops/kmeans.py) — assignment is the same MXU kernel as VQ.
- "sklearn": MiniBatchKMeans, for bit-compatible parity with
  reference-produced artifacts.

Saves BOTH a pickle (with `cluster_centers_`) and, when --output ends with
.npy, a raw centroid array — produce_kmeans_labels accepts either (the
reference's pair of scripts disagrees on the format: fit pickles the sklearn
object, produce np.loads an array — fit_kmeans.py:41 vs
produce_kmeans_labels.py:105; we accept both).
"""

from __future__ import annotations

import argparse

import numpy as np

from pero_pretraining_tpu.scripts.common import load_pickle, save_numpy, save_pickle


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True, help="Pickled or .npy features (frames, dim).")
    parser.add_argument("--k", type=int, default=4096)
    parser.add_argument("--batch-size", type=int, default=2**14)
    parser.add_argument("--iters", type=int, default=100, help="Epochs over the dataset.")
    parser.add_argument("--backend", default="jax", choices=["jax", "sklearn"])
    parser.add_argument("--init", default="auto", choices=["auto", "parallel", "++"],
                        help="jax backend seeding: k-means|| (parallel, O(rounds) device calls) or sequential k-means++.")
    parser.add_argument("--n-init", type=int, default=3,
                        help="jax backend: independent full restarts, best final inertia wins "
                             "(escapes merged-cluster local optima; 1 = fastest).")
    parser.add_argument("--polish-iters", type=int, default=8,
                        help="jax backend: final full-batch Lloyd iterations converging the "
                             "minibatch solution to its local optimum.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", required=True)
    return parser.parse_args()


def load_features(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    return np.asarray(load_pickle(path))


def fit(features: np.ndarray, k: int, batch_size: int, epochs: int, backend: str, seed: int, init: str = "auto",
        n_init: int = 3, polish_iters: int = 8):
    if backend == "sklearn":
        from sklearn.cluster import MiniBatchKMeans

        kmeans = MiniBatchKMeans(
            n_clusters=k, init="k-means++", batch_size=batch_size, max_iter=epochs, n_init=10, random_state=seed
        )
        rng = np.random.RandomState(seed)
        rng.shuffle(features)
        kmeans = kmeans.fit(features)
        return np.asarray(kmeans.cluster_centers_, dtype=np.float32), float(kmeans.inertia_)

    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans

    return fit_minibatch_kmeans(features, k, batch_size=batch_size, epochs=epochs, seed=seed, verbose=True, init=init,
                                n_init=n_init, polish_iters=polish_iters)


def main():
    args = parse_arguments()

    features = load_features(args.dataset)
    print(f"Loaded '{args.dataset}' ({features.shape})")

    centers, inertia = fit(features, args.k, args.batch_size, args.iters, args.backend, args.seed, args.init,
                           args.n_init, args.polish_iters)
    print(f"Inertia: {inertia}")

    if args.output.endswith(".npy"):
        save_numpy(centers, args.output)
    else:
        save_pickle({"cluster_centers_": centers, "inertia_": inertia, "n_clusters": args.k}, args.output)
    print(f"K-means saved to '{args.output}'")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
