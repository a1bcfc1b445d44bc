"""Checkpointing.

The reference saves only raw model state_dicts (reference:
masked_pretraining/model.py:65-69) — optimizer/scheduler/data state are lost
on resume. Here the FULL train state (params + optimizer moments + model
state + step + RNG key) round-trips, so resume is exact. File naming keeps
the reference's `checkpoint_{iteration:06d}` convention
(reference: common/helpers.py:3-7).
"""

from __future__ import annotations

import os
import jax
from flax import serialization

from pero_pretraining_tpu.training.state import TrainState


def get_checkpoint_path(checkpoints_directory: str, iteration: int) -> str:
    return os.path.join(checkpoints_directory, f"checkpoint_{iteration:06d}.msgpack")


def get_visualization_path(visualizations_directory: str, iteration: int, part: str) -> str:
    return os.path.join(visualizations_directory, f"{part}_{iteration:06d}.png")


def save_checkpoint(state: TrainState, path: str) -> str:
    """Serialize the full train state to one msgpack file (atomic rename)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    data = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(template: TrainState, path: str) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_params(params, path: str) -> str:
    """Params-only export (interops with eval / label-production tools)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return path


def load_params(template, path: str):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
