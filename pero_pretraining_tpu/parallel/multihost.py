"""Multi-host SPMD initialization (stretch goal, SURVEY.md §2.7).

The reference is strictly single-process. For pod slices spanning hosts,
JAX's standard recipe applies: call `initialize_distributed()` once at
startup (before any other jax call), then build the mesh over
`jax.devices()` — which is GLOBAL after initialization — and feed each
process its per-host shard of the batch via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on Cloud
    TPU all three are auto-detected and plain initialize() suffices).
    Returns True if distributed mode was initialized."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_local_batch_slice(total_batch: int) -> slice:
    """Which rows of the global batch this process should load."""
    per_process = total_batch // jax.process_count()
    start = jax.process_index() * per_process
    return slice(start, start + per_process)


def make_global_batch(host_batch: Dict[str, np.ndarray], mesh) -> Dict[str, Any]:
    """Assemble a global device array from per-process host shards."""
    from pero_pretraining_tpu.parallel.sharding import batch_sharding

    sharding = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return {k: put(v) for k, v in host_batch.items()}
