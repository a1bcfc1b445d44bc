"""CPU <-> TPU bit-identity check for parity-mode quantized-label production.

The north star demands bit-comparable quantized targets (BASELINE.md). The
assignment kernel (ops/vq.py::vq_assign) pins distances to fp32 with
Precision.HIGHEST exactly so the argmin is reproducible across backends
(reference analogue: scripts/produce_kmeans_labels.py:27-87 torch.cdist +
argmin). This tool PROVES it on real hardware: it assigns labels to seeded
features against seeded centroids on the ambient (TPU) backend, re-runs the
same assignment in a CPU subprocess, and asserts the int32 label streams are
bit-identical. Result is recorded in PARITY.md.

Usage:  python tools/label_parity_check.py   (from the repo root, TPU attached)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

ROWS, DIM, K, SEED = 65536, 256, 4096, 7


def make_inputs():
    """Seeded, centroid-structured features with real near-tie pressure:
    points are drawn AROUND the centroids at overlapping radius, so many
    rows have close second-nearest centroids (the regime where low-precision
    matmuls flip argmins)."""
    rng = np.random.RandomState(SEED)
    centers = rng.randn(K, DIM).astype(np.float32)
    pick = rng.randint(0, K, size=ROWS)
    feats = centers[pick] + rng.randn(ROWS, DIM).astype(np.float32) * 1.5
    return feats, centers


def assign_here() -> np.ndarray:
    import jax.numpy as jnp

    from pero_pretraining_tpu.ops.vq import vq_assign

    feats, centers = make_inputs()
    return np.asarray(vq_assign(jnp.asarray(feats), jnp.asarray(centers)))


def main() -> int:
    if os.environ.get("LABEL_PARITY_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        labels = assign_here()
        np.save(os.environ["LABEL_PARITY_OUT"], labels)
        return 0

    import jax

    platform = jax.devices()[0].platform
    labels_dev = assign_here()
    print(f"{platform}: {labels_dev.shape[0]} labels, {len(np.unique(labels_dev))} distinct codes")

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "cpu_labels.npy")
        env = dict(os.environ, LABEL_PARITY_CHILD="1", LABEL_PARITY_OUT=out, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, os.path.abspath(__file__)], env=env, check=True, cwd=REPO)
        labels_cpu = np.load(out)

    mismatches = int((labels_dev != labels_cpu).sum())
    print(f"cpu-vs-{platform} label mismatches: {mismatches} / {ROWS}")
    if mismatches:
        idx = np.nonzero(labels_dev != labels_cpu)[0][:10]
        print(f"  first differing rows: {idx.tolist()}")
        print("BIT-IDENTITY: FAIL")
        return 1
    print("BIT-IDENTITY: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
