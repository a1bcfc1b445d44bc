"""Device-mesh construction.

The reference is single-process, single-GPU (reference:
masked_pretraining/train.py:240 — `device = "cuda" if available else "cpu"`).
The TPU rebuild is SPMD from the start: a 3-D `(data, seq, model)` mesh;
gradients are reduced over `data` (ICI psum inserted by GSPMD),
tensor-parallel layers shard over `model`, and sequence-parallel attention
rotates KV shards around `seq` (parallel/ring.py). The extra axes default to
size 1, so single-chip and pure-DP code paths are unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from pero_pretraining_tpu.configs import MeshConfig

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def create_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a `(data, seq, model)` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)

    model = config.model if config.model > 0 else 1
    seq = getattr(config, "seq", 1) or 1
    if seq <= 0:
        seq = 1
    if n % (model * seq) != 0:
        raise ValueError(f"model x seq axes {model}x{seq} do not divide device count {n}")
    data = config.data if config.data > 0 else n // (model * seq)
    if data * seq * model != n:
        raise ValueError(f"mesh {data}x{seq}x{model} != device count {n}")

    mesh_devices = np.asarray(devices).reshape(data, seq, model)
    return Mesh(mesh_devices, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """1-device mesh — keeps single-chip code on the same sharded path."""
    return create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
