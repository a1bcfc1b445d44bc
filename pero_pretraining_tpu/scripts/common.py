"""Shared infrastructure for the offline target-generation tools.

Mirrors reference scripts/common.py:11-55: frozen feature-extractor loading
("pero_vgg" transfer model or a trained AE/VQ-VAE), no-shuffle dataset
iteration with `skip` support, and the artifact formats (pickle / .npy /
labels text files `"<id> <l1> <l2> ..."`) so outputs interoperate with the
reference toolchain.
"""

from __future__ import annotations

import json
import pickle
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from pero_pretraining_tpu.configs import AutoencoderConfig
from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import LinesDataset
from pero_pretraining_tpu.data.loader import DataLoader
from pero_pretraining_tpu.models.autoencoders import build_autoencoder
from pero_pretraining_tpu.models.vgg import PeroVggEncoder


def load_checkpoint_tree(path: str) -> Dict[str, Any]:
    """Template-free restore of a msgpack checkpoint (full train state or
    params-only export)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return raw


def split_variables(raw: Dict[str, Any]) -> Tuple[Any, Dict[str, Any]]:
    """Accepts a full TrainState dict, a flax variables dict, or bare params."""
    if "params" in raw:
        params = raw["params"]
        model_state = raw.get("model_state", {}) or {
            k: v for k, v in raw.items() if k not in ("params", "step", "opt_state", "rng")
        }
        return params, model_state
    return raw, {}


def init_feature_model(
    model_definition: str,
    checkpoint_path: Optional[str],
    mesh=None,
) -> Callable[[jax.Array], jax.Array]:
    """Build a jitted frozen encoder `(N, H, W, C) float -> (N, S, D)` frames.

    model_definition: "pero_vgg" or a JSON AE/VQ-VAE definition (reference:
    scripts/common.py:11-24). For AE/VQ-VAE the ENCODER output is used (the
    reference calls the full AE forward, which returns a dict and would crash
    — scripts/produce_features.py:37; clearly the encoder was intended).

    mesh: optional data-parallel mesh — the batch shards over its `data`
    axis (weights replicated), so offline label production scales linearly
    with chips. Ragged final batches are zero-padded to the data size and
    sliced back, so outputs are row-identical to the single-chip run.
    """
    if model_definition == "pero_vgg":
        model = PeroVggEncoder()

        def encode(variables, images):
            return model.apply(variables, images, train=False)

    else:
        config = AutoencoderConfig.from_definition(json.loads(model_definition))
        model = build_autoencoder(config)

        def encode(variables, images):
            return model.apply(variables, images, train=False, method=model.encode)

    if checkpoint_path is not None:
        params, model_state = split_variables(load_checkpoint_tree(checkpoint_path))
        variables = {"params": params, **model_state}
    else:  # random weights (useful for smoke tests only)
        dummy = jnp.zeros((1, 40, 64, 3), jnp.float32)
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))()

    # variables are jit ARGUMENTS, not closure constants — closing over the
    # param tree would bake megabytes of weights into the jaxpr and make
    # compilation pathologically slow
    jit_encode = jax.jit(encode)
    data_size = 1
    if mesh is not None:
        from pero_pretraining_tpu.parallel.mesh import DATA_AXIS
        from pero_pretraining_tpu.parallel.sharding import batch_sharding, replicated

        data_size = mesh.shape[DATA_AXIS]
        variables = jax.device_put(variables, replicated(mesh))
    else:
        variables = jax.device_put(variables)

    def features(images: jax.Array) -> jax.Array:
        n = images.shape[0]
        if data_size > 1:
            pad = (-n) % data_size
            if pad:
                zeros = jnp.zeros((pad,) + tuple(images.shape[1:]), images.dtype)
                images = jnp.concatenate([jnp.asarray(images), zeros], axis=0)
            images = jax.device_put(images, batch_sharding(mesh))
        out = jit_encode(variables, images)
        if out.ndim == 4:  # (N, 1, S, D) -> (N, S, D)
            out = out.squeeze(axis=1)
        return out[:n]

    return features


def init_dataset(
    lmdb_path: str,
    lines_path: str,
    batch_size: int,
    skip: int = 0,
    drop_last: bool = False,
    max_width: int = 2048,
    num_workers: int = 4,
) -> DataLoader:
    """No-shuffle loader over a lines file (reference: scripts/common.py:27-32)."""
    dataset = LinesDataset(lmdb_path, lines_path, augmentations=None, pair_images=False, skip=skip, max_width=max_width)
    creator = BatchCreator(pad_to=max_width, seed=0)
    return DataLoader(
        dataset, creator, batch_size=batch_size, shuffle=False, num_workers=num_workers, drop_last=drop_last
    )


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(data, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(data, f)


def save_numpy(data: np.ndarray, path: str) -> None:
    with open(path, "wb") as f:
        np.save(f, data)


def save_labels(data: Dict[str, list], path: str) -> None:
    """Labels file format `"<id> <l1> <l2> ..."` (reference: common.py:51-55)."""
    with open(path, "w") as f:
        for line_id, line_labels in data.items():
            f.write(f"{line_id} {' '.join(str(l) for l in line_labels)}\n")


def load_labels(path: str) -> Dict[str, list]:
    data = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                line_id, *labels = line.split()
                data[line_id] = [int(l) for l in labels]
    return data
