"""Device-mesh construction.

The reference is single-process, single-GPU (reference:
masked_pretraining/train.py:240 — `device = "cuda" if available else "cpu"`).
The TPU rebuild is SPMD from the start: a 5-D
`(data, pipe, seq, expert, model)` mesh; gradients are reduced over `data` (ICI psum inserted by GSPMD),
tensor-parallel layers shard over `model`, sequence-parallel attention
rotates KV shards around `seq` (parallel/ring.py), MoE expert weights /
token all-to-alls ride `expert` (models/moe.py), and the GPipe block-stack
pipeline rotates activations around `pipe` (parallel/pipeline.py). The extra axes default to
size 1, so single-chip and pure-DP code paths are unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from pero_pretraining_tpu.configs import MeshConfig

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
SEQ_AXIS = "seq"
EXPERT_AXIS = "expert"
MODEL_AXIS = "model"


def create_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a `(data, pipe, seq, expert, model)` mesh over the given
    (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)

    model = config.model if config.model > 0 else 1
    pipe = max(getattr(config, "pipe", 1) or 1, 1)
    seq = max(getattr(config, "seq", 1) or 1, 1)
    expert = max(getattr(config, "expert", 1) or 1, 1)
    fixed = model * pipe * seq * expert
    if n % fixed != 0:
        raise ValueError(
            f"model x pipe x seq x expert axes {model}x{pipe}x{seq}x{expert} do not divide device count {n}"
        )
    data = config.data if config.data > 0 else n // fixed
    if data * fixed != n:
        raise ValueError(f"mesh {data}x{pipe}x{seq}x{expert}x{model} != device count {n}")

    mesh_devices = np.asarray(devices).reshape(data, pipe, seq, expert, model)
    return Mesh(mesh_devices, (DATA_AXIS, PIPE_AXIS, SEQ_AXIS, EXPERT_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """1-device mesh — keeps single-chip code on the same sharded path."""
    return create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
