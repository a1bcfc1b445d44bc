"""Prefetching data loader.

Replaces the reference's torch DataLoader (common/dataloader.py:6-19):
worker THREADS decode JPEGs (cv2 releases the GIL, so threads scale without
fork/pickle overhead) with a bounded in-flight window; batches are assembled
in order and prefetched through a small queue so the host pipeline stays
ahead of the device.

`device_prefetch` additionally double-buffers device_put so the H2D transfer
of batch i+1 overlaps the computation of batch i.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import numpy as np

from pero_pretraining_tpu.data.batching import BatchCreator


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_creator: Optional[BatchCreator] = None,
        batch_size: int = 16,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 0,
        prefetch_batches: int = 2,
    ):
        self.dataset = dataset
        self.batch_creator = batch_creator if batch_creator is not None else BatchCreator()
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self._epoch = 0
        self._start_batch = 0

    def name(self) -> str:
        return self.dataset.name() if hasattr(self.dataset, "name") else type(self.dataset).__name__

    def skip_to(self, global_batch: int) -> None:
        """Restore data order for resume: position the loader as if
        `global_batch` batches had already been consumed. Shuffles are
        deterministic per (seed, epoch), so order matches an uninterrupted
        run exactly; the reference restarts data order from scratch on resume
        (SURVEY.md §5 checkpoint notes). Collation randomness (left paddings)
        is reseeded, mirroring the reference's unsaved host RNG."""
        per_epoch = len(self)
        if per_epoch <= 0:
            return
        self._epoch = global_batch // per_epoch
        self._start_batch = global_batch % per_epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(indices)
        return indices

    def plan(self, epoch: int) -> list:
        """Deterministic batch plan for `epoch`: list of dataset-index arrays,
        one per batch, in yield order. This is the loader's data order as a
        pure function of (seed, epoch) — the contract behind skip_to resume
        and multi-process sharding (data/multiprocess.py)."""
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(indices)
        n_batches = len(indices) // self.batch_size
        plans = [indices[b * self.batch_size : (b + 1) * self.batch_size] for b in range(n_batches)]
        if not self.drop_last and len(indices) % self.batch_size:
            plans.append(indices[n_batches * self.batch_size :])
        return plans

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        self._epoch += 1
        first_batch, self._start_batch = self._start_batch, 0
        n_batches = len(indices) // self.batch_size
        if not self.drop_last and len(indices) % self.batch_size:
            n_batches += 1

        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(first_batch, n_batches):
                        if stop.is_set():
                            return
                        batch_idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        out_queue.put(("batch", self.batch_creator.create_batch(items)))
                out_queue.put(("done", None))
            except BaseException as e:  # propagate worker errors to the consumer
                out_queue.put(("error", e))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                kind, payload = out_queue.get()
                if kind == "batch":
                    yield payload
                elif kind == "done":
                    return
                else:
                    raise payload
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_queue.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(batches: Iterable[Any], put: Callable[[Any], Any], depth: int = 2) -> Iterator[Any]:
    """Keep `depth` batches in flight on device ahead of the consumer."""
    import collections

    buf: "collections.deque" = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
