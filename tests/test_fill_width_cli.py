"""Packed (fill_width) pipeline through the masked train CLI: gt text file ->
convert_gt_to_lmdb records store -> --fill-width training (the reference's
packed-stream configuration, common/dataset.py:206-236)."""

import os
import sys

import numpy as np
import pytest

from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.storage import SqliteStore


def _run(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    assert main() == 0


def test_fill_width_training_cli(tmp_path, rng, monkeypatch):
    from pero_pretraining_tpu.scripts.convert_gt_to_lmdb import main as convert
    from pero_pretraining_tpu.pipelines.train_masked import main as train

    store_path = str(tmp_path / "images.sqlite")
    store = SqliteStore(store_path, readonly=False)
    gt_path = str(tmp_path / "gt.txt")
    with open(gt_path, "w") as f:
        for i in range(40):
            w = int(rng.randint(64, 160)) // 8 * 8
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"img_{i:02d}.png"
            store.put(image_id, encode_image(img, ".png"))
            labels = rng.randint(1, 32, size=w // 8).tolist()
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()

    records_path = str(tmp_path / "records_lmdb.sqlite")  # 'lmdb' in name selects PackedDataset
    _run(convert, ["cv", "--input", gt_path, "--output", records_path], monkeypatch)

    ckpt = str(tmp_path / "ckpt")
    _run(
        train,
        [
            "train_masked",
            "--trn-labels-file", records_path,
            "--tst-labels-file", records_path,
            "--lmdb-path", store_path,
            "--fill-width",
            "--batch-size", "8",
            "--max-line-width", "512",
            "--end-iteration", "2",
            "--view-step", "2",
            "--warmup-iterations", "2",
            "--backbone", '{"type":"vit","model_dim":64,"num_heads":2,"num_blocks":1,"feedforward_dim":128,"max_len":64}',
            "--head", '{"in_features":64,"out_features":32}',
            "--checkpoints", ckpt,
            "--num-workers", "2",
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(ckpt, "checkpoint_000002.msgpack"))
