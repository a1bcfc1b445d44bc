"""Data layer tests: storage backends, datasets (incl. fill_width packing),
static-shape collation semantics, and the prefetching loader."""

import json

import numpy as np
import pytest

from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import (
    LinesDataset,
    PackedDataset,
    decode_image,
    encode_image,
    make_eol_patch,
    parse_line,
)
from pero_pretraining_tpu.data.loader import DataLoader
from pero_pretraining_tpu.data.storage import SqliteStore, open_store


def _random_line_image(rng, width, height=40):
    return rng.randint(0, 256, size=(height, width, 3)).astype(np.uint8)


@pytest.fixture
def image_store(tmp_path, rng):
    """Sqlite store with 12 random 'line' JPEGs of varying widths + a lines
    file with per-frame labels."""
    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "lines.txt")
    store = SqliteStore(store_path, readonly=False)
    widths = {}
    with open(lines_path, "w") as f:
        for i in range(12):
            w = int(rng.randint(100, 600))
            img = _random_line_image(rng, w)
            image_id = f"line_{i:03d}.jpg"
            store.put(image_id, encode_image(img, ".png"))  # png: lossless
            labels = rng.randint(0, 100, size=-(-w // 8)).tolist()
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
            widths[image_id] = w
    store.commit()
    store.close()
    return store_path, lines_path, widths


def test_sqlite_store_roundtrip(tmp_path):
    path = str(tmp_path / "kv.sqlite")
    store = SqliteStore(path, readonly=False)
    store.put("a", b"1")
    store.put("b", b"22")
    store.commit()
    store.close()

    ro = open_store(path)
    assert isinstance(ro, SqliteStore)
    assert ro.get("a") == b"1"
    assert ro.get("missing") is None
    assert len(ro) == 2
    assert list(ro.keys()) == ["a", "b"]


def test_parse_line():
    assert parse_line("img.jpg 1 2 3\n") == ("img.jpg", [1, 2, 3])
    assert parse_line("img.jpg\n") == ("img.jpg", None)


def test_codec_roundtrip(rng):
    img = _random_line_image(rng, 64)
    decoded = decode_image(encode_image(img, ".png"))
    np.testing.assert_array_equal(decoded, img)


def test_lines_dataset(image_store, rng):
    store_path, lines_path, widths = image_store
    ds = LinesDataset(store_path, lines_path, max_width=512)
    assert len(ds) == 12
    item = ds[0]
    assert item["image"].shape[0] == 40
    assert item["image"].shape[1] <= 512
    assert item["labels"] is not None
    assert len(item["labels"]) <= 512 // 8
    assert item["image2"] is None

    ds_pair = LinesDataset(store_path, lines_path, pair_images=True)
    item = ds_pair[3]
    np.testing.assert_array_equal(item["image"], item["image2"])  # no augmentation -> identical


def test_lines_dataset_skip(image_store):
    store_path, lines_path, _ = image_store
    ds = LinesDataset(store_path, lines_path, skip=5)
    assert len(ds) == 7
    full = LinesDataset(store_path, lines_path)
    np.testing.assert_array_equal(ds[0]["image"], full[5]["image"])


@pytest.fixture
def packed_store(tmp_path, rng):
    """Records store keyed f'{idx:10d}' with JSON {labels, image}."""
    store_path = str(tmp_path / "images.sqlite")
    records_path = str(tmp_path / "records.sqlite")
    imgs = SqliteStore(store_path, readonly=False)
    recs = SqliteStore(records_path, readonly=False)
    for i in range(8):
        w = int(rng.randint(120, 400) // 8 * 8)
        img = _random_line_image(rng, w)
        image_id = f"seg_{i}.png"
        imgs.put(image_id, encode_image(img, ".png"))
        labels = rng.randint(1, 100, size=w // 8).tolist()
        recs.put(f"{i:10d}", json.dumps({"labels": labels, "image": image_id}).encode())
    imgs.commit(); imgs.close()
    recs.commit(); recs.close()
    return store_path, records_path


def test_packed_dataset_fill_width(packed_store):
    store_path, records_path = packed_store
    ds = PackedDataset(store_path, records_path, fill_width=True, max_width=1024)
    item = ds[0]
    assert item["image"].shape[1] <= 1024
    assert len(item["labels"]) <= 1024 // 8
    # packed stream contains label-0 EOL separators
    assert (np.asarray(item["labels"]) == 0).any()


def test_eol_patch_pattern():
    patch = make_eol_patch(40, 8)
    assert patch.shape == (40, 8, 3)
    np.testing.assert_array_equal(patch[:, :, 0], np.full((40, 8), 255))  # solid blue channel (BGR)
    np.testing.assert_array_equal(patch[:, :, 1:], np.zeros((40, 8, 2)))


def test_batch_creator_masks(rng):
    items = []
    for w in (96, 200, 256):
        items.append(
            {"image": _random_line_image(rng, w), "image2": None, "labels": list(range(w // 8)), "image_id": f"{w}"}
        )
    bc = BatchCreator(pad_to=256, seed=0)
    batch = bc.create_batch(items)

    assert batch["images"].shape == (3, 40, 256, 3)
    assert batch["image_masks"].shape == (3, 32)
    assert batch["labels"].shape == (3, 32)
    for i, w in enumerate((96, 200, 256)):
        frames = -(-w // 8)
        assert batch["image_masks"][i].sum() == frames
        # labels sit exactly where the mask is 1, -1 elsewhere
        assert (batch["labels"][i] >= 0).sum() == frames
        np.testing.assert_array_equal((batch["labels"][i] >= 0).astype(np.int32), batch["image_masks"][i])
        # content actually at the left-padding offset
        lp = int(np.argmax(batch["image_masks"][i])) if batch["image_masks"][i][0] == 0 else 0
        np.testing.assert_array_equal(batch["images"][i, :, lp * 8 : lp * 8 + w], items[i]["image"])


def test_batch_creator_pairs_shift_semantics(rng):
    items = []
    for _ in range(6):
        w = int(rng.randint(64, 200))
        img = _random_line_image(rng, w)
        items.append({"image": img, "image2": np.copy(img), "labels": None, "image_id": "x"})
    bc = BatchCreator(pad_to=256, seed=1)
    batch = bc.create_batch(items)

    sm1, sm2 = batch["shift_masks"], batch["shift_masks2"]
    im1, im2 = batch["image_masks"], batch["image_masks2"]
    shifts = batch["shifts"]
    # 1-counts agree per line (the invariance alignment depends on this)
    np.testing.assert_array_equal((sm1 == 1).sum(axis=1), (sm2 == 1).sum(axis=1))
    # rolling mask2 by shift aligns its 1-region with mask1's
    for i in range(len(items)):
        rolled = np.roll(sm2[i] == 1, shifts[i])
        np.testing.assert_array_equal(sm1[i] == 1, rolled)
    # 2 only where shared region hits padding
    assert ((sm1 == 2) <= (im1 == 0)).all()
    assert ((sm2 == 2) <= (im2 == 0)).all()


def test_batch_creator_crop_mode(rng):
    items = []
    for _ in range(4):
        w = int(rng.randint(300, 600))
        img = _random_line_image(rng, w)
        items.append({"image": img, "image2": np.copy(img), "labels": None, "image_id": "x"})
    bc = BatchCreator(crop_width=128, crop_step=8, seed=2)
    batch = bc.create_batch(items)
    assert batch["images"].shape[2] == 128
    assert batch["images2"].shape[2] == 128
    assert "original_images" in batch
    # shared content must actually match between the aligned crops
    sm1, sm2, shifts = batch["shift_masks"], batch["shift_masks2"], batch["shifts"]
    for i in range(4):
        rolled_mask = np.roll(sm2[i] == 1, shifts[i])
        both = (sm1[i] == 1) & rolled_mask
        for j in np.nonzero(both)[0]:
            src = j - shifts[i]
            np.testing.assert_array_equal(
                batch["images"][i, :, j * 8 : (j + 1) * 8],
                batch["images2"][i, :, src * 8 : (src + 1) * 8],
            )


def test_dataloader(image_store):
    store_path, lines_path, _ = image_store
    ds = LinesDataset(store_path, lines_path, max_width=512)
    loader = DataLoader(ds, BatchCreator(pad_to=512, seed=0), batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (4, 40, 512, 3)
        assert b["labels"].shape == (4, 64)
    # second epoch shuffles differently but yields the same number
    assert len(list(loader)) == 3


def test_dataloader_propagates_errors(image_store):
    store_path, lines_path, _ = image_store

    class Broken(LinesDataset):
        def __getitem__(self, idx):
            raise RuntimeError("boom")

    ds = Broken(store_path, lines_path)
    loader = DataLoader(ds, batch_size=4, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def _take(iterator, n):
    out = []
    for batch in iterator:
        out.append(list(batch["ids"]))
        if len(out) == n:
            break
    return out


def test_dataloader_stream_resume_restores_order(image_store):
    """Data-order resume: stream(k) must reproduce batches k.. of an
    uninterrupted stream(0) — even when OTHER consumers (testers,
    visualizers, the init_state peek) iterate the same loader in between."""
    store_path, lines_path, _ = image_store

    def make_loader():
        ds = LinesDataset(store_path, lines_path, max_width=512)
        return DataLoader(ds, BatchCreator(pad_to=512, seed=0), batch_size=4, shuffle=True, num_workers=2, seed=7)

    loader = make_loader()
    next(iter(loader))  # the init_state peek an uninterrupted CLI run does
    reference_ids = _take(loader.stream(0), 9)  # 3 epochs x 3 batches

    for k in (0, 2, 4, 7):
        resumed = make_loader()
        next(iter(resumed))  # eval consumers must not perturb the stream
        list(resumed)
        got = _take(resumed.stream(k), 9 - k)
        assert got == reference_ids[k:], f"mismatch at k={k}"


def test_bucketed_loader_stream_resume_restores_order(image_store):
    from pero_pretraining_tpu.data.bucketing import BucketedDataLoader

    store_path, lines_path, _ = image_store

    def make_loader():
        ds = LinesDataset(store_path, lines_path, max_width=512)
        return BucketedDataLoader(ds, buckets=(256, 512), batch_size=4, shuffle=True, num_workers=2, seed=3, drop_last=False)

    loader = make_loader()
    per_epoch = len(loader)
    reference_ids = _take(loader.stream(0), 2 * per_epoch)

    k = per_epoch
    resumed = make_loader()
    got = _take(resumed.stream(k), len(reference_ids) - k)
    assert got == reference_ids[k:]
