"""Prefetching data loader.

Replaces the reference's torch DataLoader (common/dataloader.py:6-19):
worker THREADS decode JPEGs (cv2 releases the GIL, so threads scale without
fork/pickle overhead) with a bounded in-flight window; batches are assembled
in order and prefetched through a small queue so the host pipeline stays
ahead of the device.

Two iteration surfaces with different determinism contracts:
- `__iter__`: one epoch per call with a per-loader scratch epoch counter —
  for evaluation consumers (Tester, Visualizer) where cross-run determinism
  of the shuffle does not matter.
- `stream(start_batch)`: THE training stream — an infinite batch sequence
  whose ORDER **and CONTENT** are a pure function of (seed, start_batch).
  Order comes from `plan(epoch)`; content randomness (left paddings, pair
  crops/shifts, photometric augmentation) is drawn from per-batch/per-item
  RNGs derived from (content seed, global batch index, position) — NOT from
  a process-lifetime stateful RNG. Consequences: a resumed `stream(N)`
  yields byte-identical batches to an uninterrupted `stream(0)` from
  position N; N loader processes (data/multiprocess.py) produce
  byte-identical batches to one; augmentation draws do not depend on
  decode-thread scheduling. (The reference restarts data order AND host RNG
  from scratch on resume — SURVEY.md §5.)

`plan(epoch)` + `build_batch(entry, pool, global_index)` are the primitive
contract shared with BucketedDataLoader and the multi-process sharded loader
(data/multiprocess.py), which reassembles the same plan order across worker
processes.

`device_prefetch` additionally double-buffers device_put so the H2D transfer
of batch i+1 overlaps the computation of batch i.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import SupportsItemRng


def item_getter(dataset) -> Optional[Callable]:
    """`get(idx, rng)` when the dataset supports per-item rngs AND has not
    overridden `__getitem__` (an override means custom behavior the loader
    must not bypass); None otherwise."""
    if isinstance(dataset, SupportsItemRng) and type(dataset).__getitem__ is SupportsItemRng.__getitem__:
        return dataset.get
    return None


class _PlanIteration:
    """Shared iteration machinery over a (plan, build_batch) contract.

    Subclasses provide: plan(epoch) -> list of entries,
    build_batch(entry, pool, global_index) -> batch dict, and the attributes
    num_workers / prefetch_batches / _epoch / seed."""

    def content_rngs(self, global_index: int, n_items: int):
        """(batch_rng, [item_rngs]) — pure in (content seeds, global batch
        index). The batch rng drives collation draws (left paddings, crops);
        each item rng drives that item's augmentation, so content does not
        depend on decode-thread scheduling, process count, or resume point."""
        entropy = [s & 0xFFFFFFFF for s in self._content_entropy()] + [int(global_index)]
        children = np.random.SeedSequence(entropy).spawn(n_items + 1)
        make = lambda c: np.random.RandomState(np.random.MT19937(c))
        return make(children[0]), [make(c) for c in children[1:]]

    def _content_entropy(self) -> List[int]:
        return [0 if self.seed is None else int(self.seed)]

    def _produce(self, entries: Iterable[Any]) -> Iterator[Dict[str, np.ndarray]]:
        """Threaded prefetch: decode/collate `(global_index, entry)` pairs in
        a producer thread, yield finished batches in order."""
        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for g, entry in entries:
                        if stop.is_set():
                            return
                        out_queue.put(("batch", self.build_batch(entry, pool, g)))
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

    def _entries_forever(self, start_batch: int) -> Iterator[Any]:
        per_epoch = len(self)
        if per_epoch <= 0:
            return
        g = start_batch
        plan_epoch, plan = -1, None
        while True:
            epoch = g // per_epoch
            if epoch != plan_epoch:
                plan_epoch, plan = epoch, self.plan(epoch)
            yield g, plan[g % per_epoch]
            g += 1

    def stream(self, start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite training stream, a pure function of (seed, start_batch) in
        both order AND content: epochs 0, 1, 2, ... of plan() order, content
        rngs keyed by the global batch index, regardless of what other
        consumers do with this loader. Resume = stream(consumed_batches)."""
        return self._produce(self._entries_forever(start_batch))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """One evaluation pass; each call shuffles with the next scratch
        epoch (does not affect stream())."""
        epoch = self._epoch
        self._epoch += 1
        base = epoch * len(self)
        return self._produce((base + i, e) for i, e in enumerate(self.plan(epoch)))


class DataLoader(_PlanIteration):
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

    def name(self) -> str:
        return self.dataset.name() if hasattr(self.dataset, "name") else type(self.dataset).__name__

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def plan(self, epoch: int) -> List[np.ndarray]:
        """Deterministic batch plan for `epoch`: list of dataset-index arrays,
        one per batch, in yield order — a pure function of (seed, epoch)."""
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(indices)
        n_batches = len(indices) // self.batch_size
        plans = [indices[b * self.batch_size : (b + 1) * self.batch_size] for b in range(n_batches)]
        if not self.drop_last and len(indices) % self.batch_size:
            plans.append(indices[n_batches * self.batch_size :])
        return plans

    def _content_entropy(self) -> List[int]:
        creator_seed = getattr(self.batch_creator, "seed", None)
        return [0 if self.seed is None else int(self.seed), 0 if creator_seed is None else int(creator_seed)]

    def build_batch(
        self, entry: np.ndarray, pool: ThreadPoolExecutor, global_index: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        if global_index is None:  # direct calls: legacy stateful-rng path
            items = list(pool.map(self.dataset.__getitem__, entry))
            return self.batch_creator.create_batch(items)
        batch_rng, item_rngs = self.content_rngs(global_index, len(entry))
        getter = item_getter(self.dataset)
        if getter is None:  # dataset without (or opted out of) the rng protocol
            items = list(pool.map(self.dataset.__getitem__, entry))
        else:
            items = list(pool.map(lambda t: getter(int(t[0]), rng=t[1]), zip(entry, item_rngs)))
        return self.batch_creator.create_batch(items, rng=batch_rng)


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
