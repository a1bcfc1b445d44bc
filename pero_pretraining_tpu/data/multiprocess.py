"""Multi-process sharded data loading for pod-scale hosts.

A single loader process tops out when JPEG decode saturates its cores (the
reference hits the same wall with torch DataLoader workers, which it shards
manually via the dataset `skip` offset — reference common/dataset.py:26).
This wrapper runs N independent loader PROCESSES, each materializing the
batches `g` with `g % N == rank` of the deterministic global plan
(DataLoader.plan), and the parent reassembles them in exact plan order — the
batch stream is BYTE-IDENTICAL (order and content: collation and
augmentation rngs are pure in the global batch index, loader.py) to the
single-process loader, so shuffles, skip_to resume, and parity tests carry
over unchanged.

Workers are spawned (never forked — the parent typically holds JAX/TPU
state) and import only the data layer. The loader is described by a
picklable SPEC (plain dict) built by `spec_from_data_config`, and each
worker constructs its own loader from it — no live objects cross the
process boundary except finished batches.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Any, Dict, Iterator, Optional

import numpy as np


def build_loader_from_spec(spec: Dict[str, Any]):
    """Construct the TRAIN loader described by `spec` (runs in workers and in
    the parent for metadata; the test dataset is never touched). Spec keys:
    data_config (DataConfig field dict), pair_images (bool)."""
    from pero_pretraining_tpu.configs import DataConfig
    from pero_pretraining_tpu.pipelines.cli_common import build_train_loader

    data_config = DataConfig(**spec["data_config"])
    return build_train_loader(data_config, pair_images=spec.get("pair_images", False))


def spec_from_data_config(data_config, pair_images: bool = False) -> Dict[str, Any]:
    import dataclasses

    return {"data_config": dataclasses.asdict(data_config), "pair_images": pair_images}


def _worker(spec, rank, world, start_batch, out_queue, stop_event):
    try:
        loader = build_loader_from_spec(spec)
        per_epoch = len(loader)
        if per_epoch <= 0:
            return  # parent's __iter__ yields nothing for empty loaders
        g = start_batch + ((rank - start_batch) % world)  # first g >= start with g % world == rank
        plan_epoch, plan = -1, None
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(loader.num_workers) as pool:
            while not stop_event.is_set():
                epoch = g // per_epoch
                if epoch != plan_epoch:
                    plan_epoch, plan = epoch, loader.plan(epoch)
                # plan()/build_batch(global_index) is the loader contract
                # (loader.py), so plain and bucketed loaders shard identically
                # and batch CONTENT is byte-identical to the single-process
                # loader (content rngs are pure in g, not process state)
                out_queue.put(("batch", g, loader.build_batch(plan[g % per_epoch], pool, g)))
                g += world
    except BaseException as e:  # surface worker crashes in the parent
        out_queue.put(("error", rank, e))


class MultiProcessLoader:
    """N-process sharded loader with the exact batch order of the
    single-process DataLoader it wraps."""

    def __init__(self, spec: Dict[str, Any], num_procs: int = 2, queue_depth: int = 2):
        if num_procs < 1:
            raise ValueError("num_procs must be >= 1")
        self.spec = spec
        self.num_procs = num_procs
        self.queue_depth = queue_depth
        # local (non-decoding) copy for len/name/plan metadata
        self._meta = build_loader_from_spec(spec)
        self._next_global = 0
        self._procs: list = []
        self._queues: list = []
        self._stop = None

    def name(self) -> str:
        return self._meta.name()

    def __len__(self) -> int:
        return len(self._meta)

    def skip_to(self, global_batch: int) -> None:
        """Data-order resume; must be called before iteration starts."""
        if self._procs:
            raise RuntimeError("skip_to after workers started; call close() first")
        self._next_global = global_batch

    def _ensure_workers(self):
        if self._procs:
            return
        ctx = mp.get_context("spawn")
        self._stop = ctx.Event()
        for rank in range(self.num_procs):
            q = ctx.Queue(self.queue_depth)
            p = ctx.Process(
                target=_worker,
                args=(self.spec, rank % self.num_procs, self.num_procs, self._next_global, q, self._stop),
                daemon=True,
            )
            p.start()
            self._queues.append(q)
            self._procs.append(p)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch's worth of batches (persistent workers keep streaming
        across calls, so repeated epochs cost no respawns)."""
        import queue as queue_mod

        per_epoch = len(self)
        if per_epoch <= 0:
            return
        self._ensure_workers()
        end = (self._next_global // per_epoch + 1) * per_epoch
        while self._next_global < end:
            g = self._next_global
            rank = g % self.num_procs
            # Poll with liveness checks so a worker that died BETWEEN batch
            # writes (crash, OOM-kill) raises here instead of hanging. Caveat
            # (shared with torch's DataLoader): a worker killed MID-write
            # leaves a truncated pickle in the pipe, which no reader-side
            # timeout can recover — that case needs a supervisor restart.
            # Worker-side exceptions don't kill workers at all; they arrive
            # as ("error", rank, exc) messages and re-raise below.
            while True:
                try:
                    msg = self._queues[rank].get(timeout=5.0)
                    break
                except queue_mod.Empty:
                    if not self._procs[rank].is_alive():
                        self.close()
                        raise RuntimeError(f"loader process {rank} died (batch {g})")
            if msg[0] == "error":
                self.close()
                raise msg[2]
            assert msg[1] == g, f"out-of-order batch: expected {g}, got {msg[1]}"
            self._next_global += 1
            yield msg[2]

    def stream(self, start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite train stream from global batch `start_batch` — the same
        (seed, start_batch)-pure order as the wrapped loader's stream()."""
        self.skip_to(start_batch)
        if len(self) <= 0:
            return
        while True:
            yield from self

    def close(self) -> None:
        if self._stop is not None:
            self._stop.set()
        for q in self._queues:  # unblock producers stuck on put()
            try:
                while True:
                    q.get_nowait()
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._procs, self._queues, self._stop = [], [], None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
