"""Minibatch k-means on device.

TPU-native replacement for the reference's sklearn MiniBatchKMeans
(reference: scripts/fit_kmeans.py:11-32, k=4096, batch 2^14, k-means++ init):
assignment is the same MXU distance matmul as VQ (ops/vq.py); centroid
updates follow the MiniBatchKMeans rule (per-center learning rate 1/total
count). The update step is one jitted program per minibatch.

A sklearn backend remains available in scripts/fit_kmeans.py for
bit-compatible parity with reference-produced artifacts.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.ops.vq import vq_assign, vq_distances, vq_stats


def kmeans_parallel_init(
    rng: np.random.RandomState,
    data: np.ndarray,
    k: int,
    rounds: int = 5,
    oversample: int = 0,
) -> np.ndarray:
    """k-means|| seeding (Bahmani et al.): O(rounds) device round-trips instead
    of k-means++'s O(k) sequential kernel launches — the difference between
    seconds and many minutes at k=4096 on high-latency transports.

    Each round samples ~2k candidates with probability proportional to their
    current D^2; candidates are then weighted by how many points they attract
    and reduced to k centers with weighted k-means++ ON HOST (numpy only, no
    device calls)."""
    data = np.asarray(data, dtype=np.float32)
    n, d = data.shape
    l = oversample or 2 * k
    data_dev = jnp.asarray(data)

    @jax.jit
    def min_dist_to(batch_centers, current_min):
        d2 = vq_distances(data_dev, batch_centers)
        return jnp.minimum(current_min, jnp.min(d2, axis=1))

    candidates = [data[rng.randint(n)][None]]
    min_d = np.full((n,), np.inf, dtype=np.float32)
    for _ in range(rounds):
        min_d = np.asarray(min_dist_to(jnp.asarray(candidates[-1]), jnp.asarray(min_d)))
        total = float(min_d.sum())
        if total <= 0:
            break
        probs = np.minimum(1.0, l * min_d / total)
        picked = data[rng.rand(n) < probs]
        if len(picked) == 0:
            continue
        candidates.append(picked)
    cand = np.concatenate(candidates, axis=0)

    # weight candidates by attraction counts (one device call)
    idx = np.asarray(vq_assign(data_dev, jnp.asarray(cand)))
    weights = np.bincount(idx, minlength=len(cand)).astype(np.float64)

    # weighted k-means++ on host to reduce candidates -> k centers
    centers = np.empty((k, d), dtype=np.float32)
    centers[0] = cand[rng.choice(len(cand), p=weights / weights.sum())]
    cand_min = ((cand - centers[0]) ** 2).sum(1)
    for i in range(1, k):
        w = cand_min * weights
        total = w.sum()
        if total <= 0:
            centers[i:] = cand[rng.choice(len(cand), size=k - i)]
            break
        centers[i] = cand[rng.choice(len(cand), p=w / total)]
        cand_min = np.minimum(cand_min, ((cand - centers[i]) ** 2).sum(1))
    return centers


def kmeans_plus_plus_init(rng: np.random.RandomState, data: np.ndarray, k: int, sample_size: int = 2**15) -> np.ndarray:
    """k-means++ seeding on a host-side subsample (the classic D^2 sampling).
    Runs the distance updates on device in one jitted function per center."""
    if len(data) > sample_size:
        idx = rng.choice(len(data), sample_size, replace=False)
        data = data[idx]
    data_dev = jnp.asarray(data, dtype=jnp.float32)

    centers = np.empty((k, data.shape[1]), dtype=np.float32)
    centers[0] = data[rng.randint(len(data))]

    @jax.jit
    def min_dist_update(current_min, center):
        d = jnp.sum((data_dev - center[None, :]) ** 2, axis=1)
        return jnp.minimum(current_min, d)

    min_d = jnp.full((len(data),), np.inf, dtype=jnp.float32)
    for i in range(1, k):
        min_d = min_dist_update(min_d, jnp.asarray(centers[i - 1]))
        probs = np.asarray(min_d)
        total = probs.sum()
        if total <= 0:
            centers[i] = data[rng.randint(len(data))]
            continue
        centers[i] = data[rng.choice(len(data), p=probs / total)]
    return centers


@partial(jax.jit, donate_argnums=(0, 1))
def _minibatch_update(centers: jax.Array, counts: jax.Array, batch: jax.Array):
    """One MiniBatchKMeans step: assign, then per-center convex update with
    learning rate (batch count) / (total count)."""
    idx = vq_assign(batch, centers)
    batch_counts, sums = vq_stats(idx, batch, centers.shape[0])
    new_counts = counts + batch_counts
    lr = jnp.where(new_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0), 0.0)
    batch_means = sums / jnp.maximum(batch_counts, 1.0)[:, None]
    new_centers = jnp.where(
        (batch_counts > 0)[:, None], centers * (1.0 - lr[:, None]) + batch_means * lr[:, None], centers
    )
    inertia = jnp.sum((batch - jnp.take(new_centers, idx, axis=0)) ** 2)
    return new_centers, new_counts, inertia


def _d2_sample(rng: np.random.RandomState, data: np.ndarray, centers: jax.Array, size: int) -> np.ndarray:
    """Sample `size` points with probability proportional to their squared
    distance to the nearest current center (k-means++-style reseeding targets:
    far-from-everything points, where a stranded center is actually useful)."""
    sample_size = min(len(data), 2**15)
    idx = rng.choice(len(data), sample_size, replace=False)
    sub = data[idx]
    d2 = np.asarray(jnp.min(vq_distances(jnp.asarray(sub), centers), axis=1))
    d2 = np.maximum(d2, 0.0)
    total = d2.sum()
    if total <= 0:
        return sub[rng.choice(sample_size, size=size)]
    return sub[rng.choice(sample_size, size=size, p=d2 / total)]


def _run_epoch(data, order, batch_size, centers, counts):
    inertia = 0.0
    for start in range(0, len(data) - batch_size + 1, batch_size):
        batch = jnp.asarray(data[order[start : start + batch_size]])
        centers, counts, batch_inertia = _minibatch_update(centers, counts, batch)
        inertia += float(batch_inertia)
    return centers, counts, inertia


@jax.jit
def _lloyd_accumulate(centers: jax.Array, chunk: jax.Array):
    """Assign one data chunk and return its (counts, sums, inertia) for a
    full-batch Lloyd step."""
    idx = vq_assign(chunk, centers)
    counts, sums = vq_stats(idx, chunk, centers.shape[0])
    inertia = jnp.sum((chunk - jnp.take(centers, idx, axis=0)) ** 2)
    return counts, sums, inertia


def lloyd_polish(
    data: np.ndarray, centers: np.ndarray, iters: int = 8, chunk: int = 2**18, tol: float = 1e-5
) -> Tuple[np.ndarray, float]:
    """A few full-batch Lloyd iterations (chunked over the data on device).
    Minibatch k-means leaves centers at the noise floor of its decaying
    per-center learning rates; Lloyd polishing converges them to the actual
    local optimum, which is what makes partitions reproducible across
    backends. Returns (centers, final inertia)."""
    centers_dev = jnp.asarray(centers, dtype=jnp.float32)
    inertia = float("inf")
    for _ in range(iters):
        k, d = centers_dev.shape
        counts = jnp.zeros((k,), jnp.float32)
        sums = jnp.zeros((k, d), jnp.float32)
        total = 0.0
        for start in range(0, len(data), chunk):
            c, s, i = _lloyd_accumulate(centers_dev, jnp.asarray(data[start : start + chunk]))
            counts, sums, total = counts + c, sums + s, total + float(i)
        new_centers = jnp.where((counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centers_dev)
        moved = float(jnp.max(jnp.sum((new_centers - centers_dev) ** 2, axis=1)))
        centers_dev = new_centers
        if total > 0 and abs(inertia - total) / total < tol and moved < tol:
            inertia = total
            break
        inertia = total
    return np.asarray(centers_dev), inertia


def fit_minibatch_kmeans(
    data: np.ndarray,
    k: int,
    batch_size: int = 2**14,
    epochs: int = 100,
    seed: int = 0,
    verbose: bool = False,
    init: str = "auto",
    n_init: int = 3,
    reassignment_ratio: float = 0.05,
    polish_iters: int = 8,
) -> Tuple[np.ndarray, float]:
    """Returns (centers (k, D) float32, final-epoch inertia estimate).

    init: "auto" (k-means|| above k=256, k-means++ below), "parallel", "++".
    n_init: number of independent seedings; each is scored by one epoch's
    inertia and the best continues (sklearn MiniBatchKMeans n_init analogue —
    single-init minibatch k-means is prone to merged-cluster local optima).
    reassignment_ratio: centers attracting fewer than ratio x mean per-epoch
    count are reseeded to D^2-sampled far points (sklearn's low-count random
    reassignment; without it a merged pair of clusters never splits because
    both members keep nonzero counts).
    polish_iters: final full-batch Lloyd iterations (lloyd_polish) that
    converge the minibatch solution to its local optimum."""
    rng = np.random.RandomState(seed)
    data = np.asarray(data, dtype=np.float32)
    if init == "auto":
        init = "parallel" if k > 256 else "++"

    def fit_once():
        if init == "parallel":
            centers = jnp.asarray(kmeans_parallel_init(rng, data, k))
        else:
            centers = jnp.asarray(kmeans_plus_plus_init(rng, data, k))
        counts = jnp.zeros((k,), dtype=jnp.float32)
        inertia = 0.0
        for epoch in range(epochs):
            counts_before = np.asarray(counts)
            order = rng.permutation(len(data))
            centers, counts, inertia = _run_epoch(data, order, batch_size, centers, counts)

            if epoch < epochs - 1:
                # low-count reassignment: reseed centers that attracted almost
                # no points THIS epoch to D^2-far points, and zero their
                # cumulative counts so the next updates move them at full
                # learning rate
                epoch_counts = np.asarray(counts) - counts_before
                low = np.nonzero(epoch_counts < reassignment_ratio * max(epoch_counts.mean(), 1e-9))[0]
                if len(low):
                    centers_host = np.array(centers)  # np.asarray of a jax array is read-only
                    centers_host[low] = _d2_sample(rng, data, centers, len(low))
                    centers = jnp.asarray(centers_host)
                    counts_host = np.array(counts)
                    counts_host[low] = 0.0
                    counts = jnp.asarray(counts_host)
                if verbose:
                    print(f"epoch {epoch}: inertia {inertia:.1f}, reassigned {len(low)}")
            elif verbose:
                print(f"epoch {epoch}: inertia {inertia:.1f}")
        if polish_iters > 0:
            polished, inertia = lloyd_polish(data, np.asarray(centers), iters=polish_iters)
            if verbose:
                print(f"lloyd polish: inertia {inertia:.1f}")
            return polished, inertia
        return np.asarray(centers), inertia

    # full independent restarts, best final inertia wins (sklearn n_init
    # semantics — restarts are what escape merged-cluster local optima)
    best_centers, best_inertia = fit_once()
    for trial in range(1, max(1, n_init)):
        centers, inertia = fit_once()
        if verbose:
            print(f"restart {trial}: inertia {inertia:.1f} (best {best_inertia:.1f})")
        if inertia < best_inertia:
            best_centers, best_inertia = centers, inertia
    return best_centers, best_inertia
