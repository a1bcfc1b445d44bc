"""Full-stack CLI integration tests: synthetic image store on disk -> train
CLI -> checkpoints, visualizations, metrics log. Runs on the 8-virtual-device
CPU mesh (data-parallel over all 8)."""

import json
import os
import sys

import numpy as np
import pytest

from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.storage import SqliteStore


@pytest.fixture
def tiny_corpus(tmp_path, rng):
    store_path = str(tmp_path / "images.sqlite")
    store = SqliteStore(store_path, readonly=False)
    trn_lines = str(tmp_path / "labels.trn")
    tst_lines = str(tmp_path / "labels.tst")
    for lines_path, count in ((trn_lines, 24), (tst_lines, 8)):
        with open(lines_path, "w") as f:
            for i in range(count):
                w = int(rng.randint(80, 240))
                img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
                image_id = f"{os.path.basename(lines_path)}_{i:03d}.png"
                store.put(image_id, encode_image(img, ".png"))
                labels = rng.randint(0, 64, size=-(-w // 8)).tolist()
                f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()
    return store_path, trn_lines, tst_lines


def _run_cli(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    assert main() == 0


def test_train_masked_cli(tiny_corpus, tmp_path, monkeypatch):
    from pero_pretraining_tpu.pipelines.train_masked import main

    store_path, trn_lines, tst_lines = tiny_corpus
    ckpt = str(tmp_path / "ckpt")
    vis = str(tmp_path / "vis")
    log = str(tmp_path / "metrics.jsonl")
    _run_cli(
        main,
        [
            "train_masked",
            "--trn-labels-file", trn_lines,
            "--tst-labels-file", tst_lines,
            "--lmdb-path", store_path,
            "--batch-size", "8",
            "--max-line-width", "256",
            "--end-iteration", "4",
            "--view-step", "2",
            "--warmup-iterations", "2",
            "--backbone", '{"type":"vit","model_dim":64,"num_heads":2,"num_blocks":1,"feedforward_dim":128,"max_len":64,"patch_size":[40,8]}',
            "--head", '{"in_features":64,"out_features":64}',
            "--checkpoints", ckpt,
            "--visualizations", vis,
            "--metrics-log", log,
            "--num-workers", "2",
            "--shard-opt-state",
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(ckpt, "checkpoint_000002.msgpack"))
    assert os.path.exists(os.path.join(ckpt, "checkpoint_000004.msgpack"))
    assert os.path.exists(os.path.join(vis, "trn_000002.png"))
    assert os.path.exists(os.path.join(vis, "tst_000004.png"))
    records = [json.loads(l) for l in open(log)]
    titles = {r["title"] for r in records}
    assert "loss" in titles and "top-1_error" in titles


def test_train_joint_cli(tiny_corpus, tmp_path, monkeypatch):
    from pero_pretraining_tpu.pipelines.train_joint import main

    store_path, trn_lines, tst_lines = tiny_corpus
    vis = str(tmp_path / "vis")
    _run_cli(
        main,
        [
            "train_joint",
            "--trn-lines-file", trn_lines,
            "--tst-lines-file", tst_lines,
            "--lmdb-path", store_path,
            "--batch-size", "8",
            "--max-line-width", "256",
            "--end-iteration", "2",
            "--view-step", "2",
            "--warmup-iterations", "2",
            "--loss-type", "ntxent",
            "--backbone", '{"type":"vit","model_dim":64,"num_heads":2,"num_blocks":1,"feedforward_dim":128,"max_len":64}',
            "--head", '{"type":"mlp","in_dim":64,"hidden_dim":64,"num_layers":2}',
            "--visualizations", vis,
            "--num-workers", "2",
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(vis, "trn_000002.png"))


def test_train_autoencoder_cli(tiny_corpus, tmp_path, monkeypatch):
    from pero_pretraining_tpu.pipelines.train_autoencoder import main

    store_path, trn_lines, tst_lines = tiny_corpus
    ckpt = str(tmp_path / "ckpt")
    _run_cli(
        main,
        [
            "train_autoencoder",
            "--trn-lines-file", trn_lines,
            "--tst-lines-file", tst_lines,
            "--lmdb-path", store_path,
            "--batch-size", "8",
            "--max-line-width", "256",
            "--end-iteration", "2",
            "--view-step", "2",
            "--model", '{"type":"vqvae","base_channels":8,"decoder_base_channels":32,"num_embeddings":16,"embeddings_dim":8}',
            "--checkpoints", ckpt,
            "--num-workers", "2",
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(ckpt, "checkpoint_000002.msgpack"))


@pytest.mark.parametrize(
    "extra",
    [
        ["--fused-ce", "--grad-accum", "2"],
        ["--masking-mode", "span", "--device-augment", "--keep-checkpoints", "1"],
        ["--buckets", "128,256", "--grad-accum", "2"],
        # parallelism matrix through the real CLI (argparse keeps the LAST
        # --backbone, so these override the base definition)
        ["--backbone", '{"type":"vit","model_dim":64,"num_heads":2,"num_blocks":2,'
         '"feedforward_dim":128,"max_len":64,"stacked_blocks":true}', "--mesh-pipe", "2"],
        ["--backbone", '{"type":"vit","model_dim":64,"num_heads":2,"num_blocks":1,'
         '"feedforward_dim":128,"max_len":64,"num_experts":2}', "--mesh-expert", "2"],
        ["--mesh-seq", "2", "--attention-impl", "ring"],
        ["--fsdp", "--shard-opt-state"],
    ],
    ids=["fused-ce+accum", "span+device-augment+retention", "buckets+accum",
         "pipeline", "moe-ep", "ring-sp", "fsdp+zero1"],
)
def test_train_masked_cli_flag_combinations(tiny_corpus, tmp_path, monkeypatch, extra):
    """New-feature flags compose: each combination trains end to end."""
    from pero_pretraining_tpu.pipelines.train_masked import main

    store_path, trn_lines, tst_lines = tiny_corpus
    ckpt = str(tmp_path / "ckpt")
    _run_cli(
        main,
        [
            "train_masked",
            "--trn-labels-file", trn_lines,
            "--tst-labels-file", tst_lines,
            "--lmdb-path", store_path,
            "--batch-size", "8",
            "--max-line-width", "256",
            "--end-iteration", "4",
            "--view-step", "2",
            "--warmup-iterations", "2",
            "--backbone", '{"type":"vit","model_dim":64,"num_heads":2,"num_blocks":1,"feedforward_dim":128,"max_len":64,"patch_size":[40,8]}',
            "--head", '{"in_features":64,"out_features":64}',
            "--checkpoints", ckpt,
            "--num-workers", "2",
        ] + extra,
        monkeypatch,
    )
    ckpts = sorted(os.listdir(ckpt))
    if "--keep-checkpoints" in extra:
        assert ckpts == ["checkpoint_000004.msgpack"]  # retention pruned
    else:
        assert "checkpoint_000004.msgpack" in ckpts
