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


def _write_state(host_state, path: str) -> str:
    """msgpack-encode + atomic-rename write of an already-host-resident state."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def save_checkpoint(state: TrainState, path: str) -> str:
    """Serialize the full train state to one msgpack file (atomic rename)."""
    return _write_state(jax.device_get(state), path)


def _dtype_mismatches(template, restored):
    """[(path, template_dtype, restored_dtype)] for leaves whose dtype differs.

    flax `from_bytes` restores arrays with the dtype STORED in the file, not
    the template's — and the fp32 `optax.adam` state and the bf16
    `scale_by_adam_lowmem` state are structurally IDENTICAL (only leaf dtypes
    differ), so a cross---moments-dtype restore succeeds silently and the
    next step truncates the moments. This explicit check is what turns that
    silent precision change into an actionable error (round-4 advisor
    finding: the old structure-error guard was dead code)."""
    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    r_leaves = jax.tree_util.tree_leaves(restored)
    out = []
    for (path, t), r in zip(t_leaves, r_leaves):
        td, rd = getattr(t, "dtype", None), getattr(r, "dtype", None)
        if td is not None and rd is not None and td != rd:
            out.append((jax.tree_util.keystr(path), td, rd))
    return out


def load_checkpoint(template: TrainState, path: str, cast_dtypes: bool = False) -> TrainState:
    """Restore into the structure of `template`.

    Leaf dtypes are verified against the template after the restore: a
    mismatch (e.g. an fp32-moments checkpoint loaded into a bf16-default run
    — the trees are structurally identical, only dtypes differ) raises an
    actionable error naming the fix, unless `cast_dtypes=True` deliberately
    casts the restored leaves to the template's dtypes (with a warning)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        restored = serialization.from_bytes(template, data)
    except (ValueError, KeyError) as e:
        # genuine structure mismatch — e.g. an int8-moments state
        # (ScaleByAdam8bitState) has different fields than fp32/bf16 Adam
        raise ValueError(
            f"checkpoint {path} does not match this run's train-state "
            "structure. If it was saved under a different --moments-dtype "
            "(int8 vs float32/bfloat16 states differ structurally), rerun "
            "with the matching --moments-dtype to resume it."
        ) from e
    mismatches = _dtype_mismatches(template, restored)
    if mismatches:
        if cast_dtypes:
            import logging

            logging.getLogger(__name__).warning(
                "load_checkpoint: casting %d leaves to the run's dtypes (first: %s %s->%s); "
                "numerics will differ from a native-dtype resume",
                len(mismatches), *mismatches[0],
            )
            import jax.numpy as jnp

            return jax.tree_util.tree_map(
                lambda t, r: r.astype(t.dtype) if hasattr(t, "dtype") and hasattr(r, "dtype") else r,
                template,
                restored,
            )
        shown = ", ".join(f"{p}: {rd} (run wants {td})" for p, td, rd in mismatches[:3])
        raise ValueError(
            f"checkpoint {path} was saved with different leaf dtypes than this run uses "
            f"({len(mismatches)} leaves, e.g. {shown}). Most likely it was saved under a "
            "different --moments-dtype (the pre-round-4 default was float32; the current "
            "default is bfloat16) — rerun with the matching --moments-dtype to resume it "
            "natively, or pass cast_dtypes=True to load_checkpoint to convert deliberately."
        )
    return restored


def _list_checkpoints(checkpoints_directory: str):
    """Sorted [(iteration, path)] of checkpoint files in the directory."""
    import re

    found = []
    if os.path.isdir(checkpoints_directory):
        for name in os.listdir(checkpoints_directory):
            m = re.fullmatch(r"checkpoint_(\d+)\.msgpack", name)
            if m:
                found.append((int(m.group(1)), os.path.join(checkpoints_directory, name)))
    return sorted(found)


def find_latest_checkpoint(checkpoints_directory: str):
    """(path, iteration) of the highest-numbered checkpoint, or (None, 0).
    Enables `--start-iteration -1` auto-resume after a crash — the failure
    story the reference handles with manual `--skip` offsets (reference:
    common/dataset.py:26; SURVEY.md §5)."""
    found = _list_checkpoints(checkpoints_directory)
    if not found:
        return None, 0
    iteration, path = found[-1]
    return path, iteration


def prune_checkpoints(checkpoints_directory: str, keep_last: int) -> None:
    """Delete all but the newest `keep_last` checkpoints (by iteration)."""
    if keep_last <= 0:
        return
    for _, path in _list_checkpoints(checkpoints_directory)[:-keep_last]:
        try:
            os.remove(path)
        except OSError:
            pass


class AsyncCheckpointer:
    """Overlaps checkpoint serialization + disk IO with training.

    `save` synchronously copies the state to host (must happen before the
    next donated train step invalidates the device buffers) and hands the
    msgpack encode + atomic write to a single background thread. At most one
    write is in flight; a second save waits for the first (bounded memory).
    Call `wait()` before reading the file back or exiting.
    """

    def __init__(self, keep_last: int = 0):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
        self._pending = None
        self.keep_last = keep_last

    def save(self, state: TrainState, path: str) -> None:
        self.wait()
        host_state = jax.device_get(state)

        def write():
            _write_state(host_state, path)
            if self.keep_last:
                prune_checkpoints(os.path.dirname(path) or ".", self.keep_last)

        self._pending = self._pool.submit(write)

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.result()  # re-raises write errors
            self._pending = None

    def close(self) -> None:
        self.wait()
        self._pool.shutdown()


def save_params(params, path: str) -> str:
    """Params-only export (interops with eval / label-production tools)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return path


def load_params(template, path: str):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
