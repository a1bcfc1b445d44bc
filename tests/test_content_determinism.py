"""Batch CONTENT purity (loader.py determinism contract).

Batch order has always been a pure function of (seed, start_batch); these
tests pin the stronger round-3 contract: collation draws (left paddings,
pair crops/shifts) and photometric augmentation draws are ALSO pure — keyed
by (content seeds, global batch index, item position), not by process-
lifetime RNG state or thread scheduling. Byte-identical batches across:
fresh loader instances, stream() resume points, thread counts, and the
multi-process sharded loader.
"""

import numpy as np
import pytest

from pero_pretraining_tpu.data.augment import build_augmentations
from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import LinesDataset, SupportsItemRng, encode_image
from pero_pretraining_tpu.data.loader import DataLoader, item_getter
from pero_pretraining_tpu.data.storage import SqliteStore


@pytest.fixture
def corpus(tmp_path, rng):
    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "lines.txt")
    store = SqliteStore(store_path, readonly=False)
    with open(lines_path, "w") as f:
        for i in range(12):
            w = int(rng.randint(100, 400))
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"line_{i:03d}.png"
            store.put(image_id, encode_image(img, ".png"))
            labels = rng.randint(0, 100, size=-(-w // 8)).tolist()
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()
    return store_path, lines_path


def _loader(corpus, num_workers=2, pair=False, aug="light"):
    store_path, lines_path = corpus
    ds = LinesDataset(store_path, lines_path, max_width=512, pair_images=pair,
                      augmentations=build_augmentations(aug))
    return DataLoader(ds, BatchCreator(pad_to=512, seed=3), batch_size=4,
                      shuffle=True, num_workers=num_workers)


def _collect(stream, n):
    out = []
    for batch in stream:
        out.append(batch)
        if len(out) == n:
            return out
    return out


def _assert_batches_equal(a, b):
    assert list(a["ids"]) == list(b["ids"])
    for key in ("images", "images2", "image_masks", "labels", "shifts", "shift_masks"):
        if key in a or key in b:
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def test_augmented_stream_is_pure_across_instances(corpus):
    """Two fresh loaders (unseeded augmentation objects!) produce
    byte-identical augmented batches — draws come from the stream position,
    not the augmentation object's own RNG."""
    got = _collect(_loader(corpus).stream(0), 3)
    want = _collect(_loader(corpus).stream(0), 3)
    for a, b in zip(got, want):
        _assert_batches_equal(a, b)


def test_augmented_stream_resume_is_byte_identical(corpus):
    """stream(k) reproduces the exact bytes of an uninterrupted run — the
    left paddings and augmentation draws of batch k don't depend on having
    produced batches 0..k-1 in this process."""
    want = _collect(_loader(corpus, pair=True).stream(0), 4)
    got = _collect(_loader(corpus, pair=True).stream(2), 2)
    for a, b in zip(got, want[2:]):
        _assert_batches_equal(a, b)


def test_content_independent_of_thread_count(corpus):
    """1 vs 4 decode threads: identical bytes (per-item rngs, so the draw
    order cannot depend on which thread finishes first)."""
    a = _collect(_loader(corpus, num_workers=1).stream(0), 2)
    b = _collect(_loader(corpus, num_workers=4).stream(0), 2)
    for x, y in zip(a, b):
        _assert_batches_equal(x, y)


def test_scratch_epochs_still_distinct(corpus):
    """Purity must not collapse randomness: different stream positions get
    different paddings/augmentation (batches of the same line differ)."""
    loader = _loader(corpus)
    n = len(loader)
    epoch0 = _collect(loader.stream(0), n)
    epoch1 = _collect(loader.stream(n), n)
    # same dataset, so some line appears in both epochs; its pixels must
    # differ (different augmentation + padding draws)
    by_id0 = {i: b["images"][k] for b in epoch0 for k, i in enumerate(b["ids"])}
    by_id1 = {i: b["images"][k] for b in epoch1 for k, i in enumerate(b["ids"])}
    common = set(by_id0) & set(by_id1)
    assert common
    assert any(not np.array_equal(by_id0[i], by_id1[i]) for i in common)


def test_item_getter_respects_getitem_override(corpus):
    """A subclass overriding __getitem__ opts out of the rng protocol —
    the loader must not bypass the override."""
    store_path, lines_path = corpus

    class Custom(LinesDataset):
        def __getitem__(self, idx):
            item = super().__getitem__(idx)
            item["image"] = item["image"][:, :8]
            return item

    plain = LinesDataset(store_path, lines_path, max_width=512)
    assert item_getter(plain) is not None
    custom = Custom(store_path, lines_path, max_width=512)
    assert item_getter(custom) is None
    assert isinstance(custom, SupportsItemRng)

    loader = DataLoader(custom, BatchCreator(pad_to=512, seed=0), batch_size=4,
                        shuffle=False, num_workers=2)
    batch = next(iter(loader.stream(0)))
    # the override ran: every line is 8 px wide -> exactly one content frame
    assert (batch["image_masks"].sum(axis=1) == 1).all()
