"""Offline toolchain tests: the full FQ pipeline (features -> k-means ->
labels -> masked training input), VQ-VAE labels, dataset conversion/merging,
and n-gram analysis — all through the CLI mains."""

import json
import os
import sys

import numpy as np
import pytest

from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.storage import SqliteStore, open_store


@pytest.fixture
def corpus(tmp_path, rng):
    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "lines.txt")
    store = SqliteStore(store_path, readonly=False)
    with open(lines_path, "w") as f:
        for i in range(10):
            w = int(rng.randint(100, 300))
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"line_{i:03d}.png"
            store.put(image_id, encode_image(img, ".png"))
            f.write(f"{image_id}\n")
    store.commit()
    store.close()
    return store_path, lines_path


def _run(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    assert main() == 0


AE_DEF = '{"type":"ae","base_channels":8,"decoder_base_channels":32}'


def test_fq_toolchain_end_to_end(corpus, tmp_path, monkeypatch):
    """produce_features -> fit_kmeans (jax) -> produce_kmeans_labels."""
    from pero_pretraining_tpu.scripts.produce_features import main as produce_features
    from pero_pretraining_tpu.scripts.fit_kmeans import main as fit_kmeans
    from pero_pretraining_tpu.scripts.produce_kmeans_labels import main as produce_labels

    store_path, lines_path = corpus
    features_path = str(tmp_path / "features.npy")
    _run(
        produce_features,
        ["pf", "--model-definition", AE_DEF, "--lines-path", lines_path, "--lmdb-path", store_path,
         "--batch-size", "4", "--max-line-width", "320", "--output", features_path],
        monkeypatch,
    )
    features = np.load(features_path)
    assert features.ndim == 2 and features.shape[0] > 0

    kmeans_path = str(tmp_path / "kmeans.npy")
    _run(
        fit_kmeans,
        ["fk", "--dataset", features_path, "--k", "16", "--batch-size", "64", "--iters", "3",
         "--output", kmeans_path],
        monkeypatch,
    )
    centers = np.load(kmeans_path)
    assert centers.shape == (16, features.shape[1])

    labels_path = str(tmp_path / "labels.trn")
    _run(
        produce_labels,
        ["pkl", "--model-definition", AE_DEF, "--kmeans-path", kmeans_path, "--lines-path", lines_path,
         "--lmdb-path", store_path, "--batch-size", "4", "--max-line-width", "320", "--output", labels_path],
        monkeypatch,
    )
    lines = [l.split() for l in open(labels_path) if l.strip()]
    assert len(lines) == 10
    for parts in lines:
        assert all(0 <= int(x) < 16 for x in parts[1:])
        assert len(parts) > 1  # every line got labels for its real frames


def test_kmeans_parallel_init_quality(rng):
    """k-means|| seeding must match k-means++ final quality (it replaces k
    sequential device calls with O(rounds))."""
    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans

    true_centers = rng.randn(16, 8).astype(np.float32) * 10
    data = np.vstack([true_centers[i] + rng.randn(300, 8).astype(np.float32) for i in range(16)])

    def inertia(c):
        d = ((data[:, None, :] - c[None]) ** 2).sum(-1)
        return d.min(1).sum()

    c_pp, _ = fit_minibatch_kmeans(data, 16, batch_size=512, epochs=8, seed=0, init="++")
    c_par, _ = fit_minibatch_kmeans(data, 16, batch_size=512, epochs=8, seed=0, init="parallel")
    assert inertia(c_par) < inertia(c_pp) * 1.1


def test_jax_kmeans_quality(rng):
    """TPU minibatch k-means must reach sklearn-comparable inertia on
    well-separated clusters and recover the cluster structure."""
    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans
    from sklearn.cluster import MiniBatchKMeans

    true_centers = rng.randn(8, 16).astype(np.float32) * 10
    data = np.vstack([true_centers[i] + rng.randn(200, 16).astype(np.float32) for i in range(8)])

    centers, _ = fit_minibatch_kmeans(data, 8, batch_size=256, epochs=10, seed=0)
    sk = MiniBatchKMeans(n_clusters=8, batch_size=256, n_init=5, random_state=0).fit(data)

    def inertia(c):
        d = ((data[:, None, :] - c[None]) ** 2).sum(-1)
        return d.min(1).sum()

    ours, theirs = inertia(centers), inertia(sk.cluster_centers_)
    assert ours < theirs * 1.05  # within 5% of sklearn


def test_kmeans_backend_label_agreement(rng):
    """Quantized-target cross-backend gate: the SAME features clustered by the
    jax backend vs sklearn must produce labels that agree >=95% after
    Hungarian cluster matching (cluster ids are arbitrary; the PARTITION is
    what FQ targets depend on). Assignment uses the identical vq_assign kernel
    for both centroid sets, isolating the clustering difference.

    Reference: scripts/fit_kmeans.py:11-32 + produce_kmeans_labels.py:27-87.
    The measured agreement is printed and recorded in PARITY.md."""
    from scipy.optimize import linear_sum_assignment
    from sklearn.cluster import MiniBatchKMeans

    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans
    from pero_pretraining_tpu.ops.vq import vq_assign

    # moderately-separated blobs: realistic difficulty (features from a frozen
    # encoder cluster, but with overlap), not a toy well-separated case
    k, dim = 16, 32
    true_centers = rng.randn(k, dim).astype(np.float32) * 3.0
    data = np.vstack([true_centers[i] + rng.randn(400, dim).astype(np.float32) for i in range(k)])
    holdout = np.vstack([true_centers[i] + rng.randn(100, dim).astype(np.float32) for i in range(k)])

    ours, _ = fit_minibatch_kmeans(data, k, batch_size=512, epochs=10, seed=0)
    sk = MiniBatchKMeans(n_clusters=k, batch_size=512, n_init=5, random_state=0).fit(data)

    import jax.numpy as jnp

    labels_ours = np.asarray(vq_assign(jnp.asarray(holdout), jnp.asarray(ours)))
    labels_sk = np.asarray(vq_assign(jnp.asarray(holdout), jnp.asarray(sk.cluster_centers_, dtype=np.float32)))

    confusion = np.zeros((k, k), dtype=np.int64)
    np.add.at(confusion, (labels_ours, labels_sk), 1)
    row, col = linear_sum_assignment(-confusion)
    agreement = confusion[row, col].sum() / len(holdout)

    def inertia(centers):
        d = ((data[:, None, :] - centers[None]) ** 2).sum(-1)
        return d.min(1).sum()

    ratio = inertia(ours) / inertia(sk.cluster_centers_)
    print(f"kmeans cross-backend label agreement (Hungarian-matched): {agreement:.4f}, inertia ratio {ratio:.4f}")
    # Gate: same-quality optima must agree >=95%; when the partitions differ,
    # the jax backend must be the BETTER one (lower inertia) — i.e. it never
    # silently hands users worse FQ targets than sklearn would.
    assert agreement >= 0.95 or ratio < 0.999, (
        f"jax-vs-sklearn FQ label agreement {agreement:.4f} with inertia ratio {ratio:.4f}: "
        "jax backend produced a different AND not-better partition"
    )
    assert ratio < 1.02, f"jax backend inertia {ratio:.4f}x sklearn's (worse clustering)"


def test_vq_assign_deterministic_across_runs(rng):
    """The parity-mode assignment kernel is deterministic: identical inputs
    give bit-identical labels across calls (fp32-pinned distances; the
    CPU-vs-TPU bit-identity check is tools/label_parity_check.py, run on
    real hardware and recorded in PARITY.md)."""
    import jax.numpy as jnp

    from pero_pretraining_tpu.ops.vq import vq_assign

    feats = rng.randn(1024, 64).astype(np.float32)
    centers = rng.randn(128, 64).astype(np.float32)
    a = np.asarray(vq_assign(jnp.asarray(feats), jnp.asarray(centers)))
    b = np.asarray(vq_assign(jnp.asarray(feats), jnp.asarray(centers)))
    np.testing.assert_array_equal(a, b)


def test_vqvae_labels_script(corpus, tmp_path, monkeypatch):
    from pero_pretraining_tpu.scripts.produce_vqvae_labels import main as produce_vqvae

    store_path, lines_path = corpus
    vq_def = '{"type":"vqvae","base_channels":8,"decoder_base_channels":32,"num_embeddings":16,"embeddings_dim":8}'

    # make a checkpoint by initializing a model and saving params
    import jax
    from flax import serialization
    from pero_pretraining_tpu.configs import AutoencoderConfig
    from pero_pretraining_tpu.models.autoencoders import build_autoencoder

    model = build_autoencoder(AutoencoderConfig.from_definition(json.loads(vq_def)))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 40, 64, 3), np.float32), train=False)
    )()
    ckpt_path = str(tmp_path / "vqvae.msgpack")
    with open(ckpt_path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(dict(variables))))

    labels_path = str(tmp_path / "vq_labels.trn")
    _run(
        produce_vqvae,
        ["pvl", "--lines-path", lines_path, "--lmdb-path", store_path, "--model", vq_def,
         "--batch-size", "4", "--max-line-width", "320", "--checkpoint-path", ckpt_path,
         "--labels-path", labels_path],
        monkeypatch,
    )
    lines = [l.split() for l in open(labels_path) if l.strip()]
    assert len(lines) == 10
    assert all(0 <= int(x) < 16 for parts in lines for x in parts[1:])


def test_convert_and_merge(tmp_path, rng, monkeypatch):
    from pero_pretraining_tpu.scripts.convert_gt_to_lmdb import main as convert
    from pero_pretraining_tpu.scripts.merge_lines_dataset import main as merge
    from pero_pretraining_tpu.data.dataset import PackedDataset

    # gt file + image store
    store_path = str(tmp_path / "images.sqlite")
    store = SqliteStore(store_path, readonly=False)
    gt_path = str(tmp_path / "gt.txt")
    with open(gt_path, "w") as f:
        for i in range(30):
            w = 80
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"img_{i:02d}.png"
            store.put(image_id, encode_image(img, ".png"))
            labels = rng.randint(1, 50, size=w // 8).tolist()
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()

    records_path = str(tmp_path / "records.sqlite")
    _run(convert, ["cv", "--input", gt_path, "--output", records_path], monkeypatch)
    with open_store(records_path) as rs:
        assert len(rs) == 30
        rec = json.loads(rs.get(f"{0:10d}"))
        assert rec["image"] == "img_00.png"

    trn_path = str(tmp_path / "merged_trn.sqlite")
    tst_path = str(tmp_path / "merged_tst.sqlite")
    _run(
        merge,
        ["mg", "--input", records_path, "--trn-output", trn_path, "--tst-output", tst_path,
         "--tst-target-size", "2", "--min-length", "30"],
        monkeypatch,
    )
    with open_store(trn_path) as ts:
        n_trn = len(ts)
        merged = json.loads(ts.get(f"{0:10d}"))
        assert len(merged["labels"]) >= 30
        assert len(merged["images"]) >= 2  # actually concatenated
    assert n_trn > 0

    # merged records feed PackedDataset in fill_width mode
    ds = PackedDataset(store_path, trn_path, fill_width=True, max_width=512)
    item = ds[0]
    assert item["image"].shape[1] <= 512


def test_ngram_tools(tmp_path, rng, monkeypatch):
    from pero_pretraining_tpu.scripts.calculate_ngrams import main as calc
    from pero_pretraining_tpu.scripts.visualize_ngrams import main as vis

    store_path = str(tmp_path / "images.sqlite")
    store = SqliteStore(store_path, readonly=False)
    labels_path = str(tmp_path / "labels.txt")
    with open(labels_path, "w") as f:
        for i in range(8):
            w = 160
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"l{i}.png"
            store.put(image_id, encode_image(img, ".png"))
            labels = (rng.randint(0, 4, size=w // 8)).tolist()  # small vocab -> repeated ngrams
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()

    ngrams_path = str(tmp_path / "ngrams.txt")
    _run(calc, ["cn", "--labels", labels_path, "--output", ngrams_path, "--n", "3", "--top", "10"], monkeypatch)
    rows = [l for l in open(ngrams_path) if l.strip()]
    assert 0 < len(rows) <= 10
    counts = [int(r.split("\t")[1]) for r in rows]
    assert counts == sorted(counts, reverse=True)

    collage_path = str(tmp_path / "collage.png")
    _run(
        vis,
        ["vn", "--labels", labels_path, "--ngrams", ngrams_path, "--lmdb", store_path,
         "--crops-per-line", "4", "--output", collage_path],
        monkeypatch,
    )
    assert os.path.exists(collage_path)


def test_produce_labels_precision_fast(corpus, tmp_path, monkeypatch):
    """--precision fast applies the bf16 matmul context and yields labels in
    range; on CPU both precisions should agree exactly."""
    import sys

    from pero_pretraining_tpu.scripts.produce_kmeans_labels import main as run_labels

    store_path, lines_path = corpus
    rng = np.random.RandomState(0)
    kmeans_path = str(tmp_path / "centroids.npy")
    np.save(kmeans_path, rng.randn(16, 32).astype(np.float32))  # 32 = AE_DEF feature dim

    outputs = {}
    for precision in ("parity", "fast"):
        out = str(tmp_path / f"labels_{precision}.trn")
        argv = ["pkl", "--model-definition", AE_DEF, "--kmeans-path", kmeans_path,
                "--lines-path", lines_path, "--lmdb-path", store_path,
                "--batch-size", "4", "--max-line-width", "320",
                "--precision", precision, "--output", out]
        monkeypatch.setattr(sys, "argv", argv)
        assert run_labels() == 0
        outputs[precision] = open(out).read()
    assert outputs["parity"] == outputs["fast"]  # CPU backend: same math


def test_produce_features_mesh_data_row_identical(corpus, tmp_path, monkeypatch):
    """--mesh-data 2 shards the frozen-encoder batch over two devices; the
    dumped features must be ROW-IDENTICAL to the single-chip run (batch
    parallelism adds no reductions; ragged final batches are padded+sliced)."""
    from pero_pretraining_tpu.scripts.produce_features import main as produce_features

    store_path, lines_path = corpus
    single = str(tmp_path / "f1.npy")
    sharded = str(tmp_path / "f2.npy")
    # batch 3 over 10 lines -> ragged final batch exercises the pad+slice path
    base = ["pf", "--model-definition", AE_DEF, "--lines-path", lines_path, "--lmdb-path", store_path,
            "--batch-size", "3", "--max-line-width", "320"]
    _run(produce_features, base + ["--output", single], monkeypatch)
    _run(produce_features, base + ["--mesh-data", "2", "--output", sharded], monkeypatch)
    np.testing.assert_array_equal(np.load(single), np.load(sharded))
