"""Width-bucketed batching.

The reference pads every batch to its max width + 32 (dynamic shapes,
common/dataloader.py:195-196) and this framework's default pads to a single
static `max_width`. For corpora of highly variable line widths the fixed
canvas wastes compute on padding the transformer still attends over. Width
bucketing is the TPU-idiomatic middle ground: a small set of static widths
(e.g. 512/1024/2048), each line batched with peers from its bucket — one
compiled program per bucket, shapes still fully static, padding waste bounded
by the bucket granularity.

Widths come from per-frame label counts when the dataset has labels (labels
files carry one label per 8 px, so width is known WITHOUT decoding the
JPEG), or from an optional `widths` callable.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.loader import _PlanIteration, item_getter


def bucket_for(width_px: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= width (largest bucket for oversized lines)."""
    for b in buckets:
        if width_px <= b:
            return b
    return buckets[-1]


class BucketedDataLoader(_PlanIteration):
    """Groups dataset indices into width buckets; yields fixed-shape batches
    per bucket with the batch order shuffled across buckets. Shares the
    plan()/build_batch()/stream() contract with DataLoader (see loader.py),
    so the training stream is deterministic in (seed, start_batch) and the
    multi-process sharded loader works over buckets too."""

    def __init__(
        self,
        dataset,
        buckets: Sequence[int] = (512, 1024, 2048),
        batch_size: int = 16,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 0,
        subsampling_factor: int = 8,
        width_of: Optional[Callable[[int], int]] = None,
        creator_kwargs: Optional[dict] = None,
    ):
        self.dataset = dataset
        self.buckets = sorted(buckets)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.subsampling_factor = subsampling_factor
        self.prefetch_batches = 2
        self._epoch = 0

        kwargs = dict(creator_kwargs or {})
        kwargs.pop("pad_to", None)
        self.creators: Dict[int, BatchCreator] = {
            b: BatchCreator(pad_to=b, subsampling_factor=subsampling_factor, seed=seed, **kwargs)
            for b in self.buckets
        }

        self._assignments = self._assign(width_of)

    def name(self) -> str:
        return self.dataset.name() if hasattr(self.dataset, "name") else type(self.dataset).__name__

    def _width_from_labels(self, idx: int) -> Optional[int]:
        """Label count * 8 px — exact for labels files (one label per frame,
        reference scripts/common.py:51-55 format)."""
        ds = self.dataset
        if hasattr(ds, "_labels") and hasattr(ds, "_image_ids"):
            image_id = ds._image_ids[idx + getattr(ds, "skip", 0)]
            labels = ds._labels.get(image_id)
            if labels is not None:
                return len(labels) * self.subsampling_factor
        return None

    def _assign(self, width_of: Optional[Callable[[int], int]]) -> Dict[int, List[int]]:
        assignments: Dict[int, List[int]] = {b: [] for b in self.buckets}
        fallback = self.buckets[-1]
        for idx in range(len(self.dataset)):
            width = width_of(idx) if width_of is not None else self._width_from_labels(idx)
            bucket = fallback if width is None else bucket_for(width, self.buckets)
            assignments[bucket].append(idx)
        return assignments

    def bucket_counts(self) -> Dict[int, int]:
        return {b: len(v) for b, v in self._assignments.items()}

    def __len__(self) -> int:
        total = 0
        for indices in self._assignments.values():
            if self.drop_last:
                total += len(indices) // self.batch_size
            else:
                total += -(-len(indices) // self.batch_size)
        return total

    def plan(self, epoch: int) -> List[tuple]:
        """Deterministic (bucket, index-array) plan for `epoch` — a pure
        function of (seed, epoch); per-bucket shuffles and the cross-bucket
        batch order both derive from one epoch-seeded RNG."""
        rng = np.random.RandomState(self.seed + epoch)
        plans: List[tuple] = []
        for bucket, indices in self._assignments.items():
            indices = np.asarray(indices)
            if self.shuffle:
                rng.shuffle(indices)
            n_batches = len(indices) // self.batch_size
            rem = len(indices) % self.batch_size
            for b in range(n_batches):
                plans.append((bucket, indices[b * self.batch_size : (b + 1) * self.batch_size]))
            if rem and not self.drop_last:
                plans.append((bucket, indices[-rem:]))
        if self.shuffle:
            rng.shuffle(plans)
        return plans

    def build_batch(self, entry: tuple, pool, global_index: Optional[int] = None) -> Dict[str, np.ndarray]:
        bucket, batch_idx = entry
        if global_index is None:
            batch_rng = None
            items = list(pool.map(self.dataset.__getitem__, batch_idx))
        else:
            batch_rng, item_rngs = self.content_rngs(global_index, len(batch_idx))
            getter = item_getter(self.dataset)
            if getter is None:
                items = list(pool.map(self.dataset.__getitem__, batch_idx))
            else:
                items = list(pool.map(lambda t: getter(int(t[0]), rng=t[1]), zip(batch_idx, item_rngs)))
        # clip oversized lines to their bucket (largest bucket only)
        for item in items:
            if item["image"].shape[1] > bucket:
                item["image"] = item["image"][:, :bucket]
                if item.get("labels") is not None:
                    item["labels"] = list(item["labels"])[: bucket // self.subsampling_factor]
                if item.get("image2") is not None:
                    item["image2"] = item["image2"][:, :bucket]
        return self.creators[bucket].create_batch(items, rng=batch_rng)
