"""MultiProcessLoader: N spawned loader processes must reproduce the exact
batch order of the single-process DataLoader, including skip_to resume."""

import dataclasses
import os

import numpy as np
import pytest

from pero_pretraining_tpu.configs import DataConfig
from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.multiprocess import MultiProcessLoader, build_loader_from_spec
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
    spec = {
        "data_config": dataclasses.asdict(
            DataConfig(
                lmdb_path=store_path, trn_path=lines_path, tst_path=lines_path,
                batch_size=4, max_width=512, num_workers=2, seed=5, shuffle=True,
            )
        ),
        "pair_images": False,
    }
    return spec


def _epoch_ids(loader, epochs):
    out = []
    for _ in range(epochs):
        for batch in loader:
            out.append(list(batch["ids"]))
    return out


def test_multiprocess_matches_single_process_order(corpus):
    single = build_loader_from_spec(corpus)
    want = _epoch_ids(single, 2)

    mp_loader = MultiProcessLoader(corpus, num_procs=2)
    try:
        assert len(mp_loader) == len(single)
        got = _epoch_ids(mp_loader, 2)
    finally:
        mp_loader.close()
    assert got == want


def test_multiprocess_skip_to(corpus):
    single = build_loader_from_spec(corpus)
    want = _epoch_ids(single, 2)  # 6 batches

    mp_loader = MultiProcessLoader(corpus, num_procs=2)
    try:
        mp_loader.skip_to(4)
        got = []
        for batch in mp_loader:  # finishes epoch 1: batches 4, 5
            got.append(list(batch["ids"]))
    finally:
        mp_loader.close()
    assert got == want[4:6]


def test_multiprocess_rejects_late_skip(corpus):
    mp_loader = MultiProcessLoader(corpus, num_procs=2)
    try:
        it = iter(mp_loader)
        next(it)
        with pytest.raises(RuntimeError):
            mp_loader.skip_to(0)
    finally:
        mp_loader.close()


def test_multiprocess_worker_error_propagates(corpus):
    """A worker that crashes while building batches surfaces its exception in
    the parent instead of hanging. (A worker KILLED mid-pipe-write leaves a
    truncated pickle no reader can recover — documented caveat, same as
    torch's DataLoader; clean deaths are caught by the liveness poll.)"""
    import copy

    broken = copy.deepcopy(corpus)
    broken["data_config"]["lmdb_path"] = broken["data_config"]["lmdb_path"] + ".missing"
    mp_loader = MultiProcessLoader(broken, num_procs=2)
    try:
        with pytest.raises(Exception):
            next(iter(mp_loader))
    finally:
        mp_loader.close()


@pytest.mark.skipif(os.cpu_count() < 4, reason="throughput scaling needs >=4 cores")
def test_multiprocess_throughput_scales(tmp_path, rng):
    """4 loader processes must beat 1 on decode-bound work by >=1.6x.

    Skipped on this 1-core CI host (where only order-correctness is provable);
    the assertion becomes load-bearing the moment a multi-core host runs the
    suite. JPEG decode dominates per-item cost, so the workload parallelizes."""
    import time

    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "lines.txt")
    store = SqliteStore(store_path, readonly=False)
    with open(lines_path, "w") as f:
        for i in range(96):
            img = rng.randint(0, 256, size=(40, 1600, 3)).astype(np.uint8)
            image_id = f"line_{i:03d}.jpg"
            store.put(image_id, encode_image(img, ".jpg"))
            f.write(f"{image_id} {' '.join(map(str, rng.randint(0, 100, size=200).tolist()))}\n")
    store.commit()
    store.close()
    spec = {
        "data_config": dataclasses.asdict(
            DataConfig(
                lmdb_path=store_path, trn_path=lines_path, tst_path=lines_path,
                batch_size=8, max_width=2048, num_workers=0, seed=5, shuffle=True,
            )
        ),
        "pair_images": False,
    }

    def rate(num_procs):
        loader = MultiProcessLoader(spec, num_procs=num_procs)
        try:
            n, t0 = 0, None
            for _ in range(3):  # 3 epochs; first batches amortize spawn cost
                for _ in loader:
                    if t0 is None:
                        t0 = time.perf_counter()  # clock from first batch
                    else:
                        n += 1
            return n / (time.perf_counter() - t0)
        finally:
            loader.close()

    r1, r4 = rate(1), rate(4)
    assert r4 / r1 >= 1.6, f"4-proc rate {r4:.1f} b/s vs 1-proc {r1:.1f} b/s"


def test_multiprocess_bucketed_matches_stream(corpus):
    """--loader-procs composes with --buckets: workers shard the bucketed
    plan and the parent's order equals the single-process stream()."""
    import copy

    spec = copy.deepcopy(corpus)
    spec["data_config"]["buckets"] = (256, 512)
    single = build_loader_from_spec(spec)
    want = []
    for batch in single.stream(0):
        want.append(list(batch["ids"]))
        if len(want) == 2 * len(single):
            break

    mp_loader = MultiProcessLoader(spec, num_procs=2)
    try:
        got = _epoch_ids(mp_loader, 2)
    finally:
        mp_loader.close()
    assert got == want
