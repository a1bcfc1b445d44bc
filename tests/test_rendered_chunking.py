"""Chunked pretraining == monolithic pretraining (tools/rendered_experiment.py).

The 50k rendered-study pretrains run as fixed-size CHUNKS — one process per
12k steps with a .part checkpoint between re-invocations — to work around the
axon tunnel client's per-step host-memory accumulation. The validity of every
chunked table row rests on run_trainer's claim that the chunked run is
IDENTICAL to the monolithic one: same batch order (scratch epoch 0 feeds
init_state, training consumes plan epochs 1, 2, ... == loader.stream(len(loader)
+ done)), same per-step RNG (derived from state.step), same final weights.
This proves it end-to-end on a tiny corpus, simulating the process restarts
with a fresh loader + run_trainer call per chunk.
"""

import importlib.util
import os

import jax
import numpy as np
import pytest

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import LinesDataset, encode_image
from pero_pretraining_tpu.data.loader import DataLoader
from pero_pretraining_tpu.data.storage import SqliteStore
from pero_pretraining_tpu.pipelines.masked import MaskedTask

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "rendered_experiment.py")
WIDTH = 256
NUM_LABELS = 23


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location("rendered_experiment", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunk_corpus")
    store_path, lines_path = str(tmp / "images.sqlite"), str(tmp / "lines.txt")
    rng = np.random.RandomState(7)
    store = SqliteStore(store_path, readonly=False)
    with open(lines_path, "w") as f:
        for i in range(10):
            w = int(rng.randint(96, WIDTH))
            img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
            image_id = f"line_{i:03d}.png"
            store.put(image_id, encode_image(img, ".png"))
            labels = rng.randint(0, NUM_LABELS, size=-(-w // 8)).tolist()
            f.write(f"{image_id} {' '.join(map(str, labels))}\n")
    store.commit()
    store.close()
    return store_path, lines_path


def _task():
    backbone = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2,
                              feedforward_dim=128, max_len=256)
    training = TrainingConfig(learning_rate=1e-3, warmup_iterations=2, batch_size=2,
                              masking_prob=0.3, seed=0)
    return MaskedTask(backbone, HeadConfig(in_features=64, out_features=NUM_LABELS), training)


def _loader(corpus):
    store_path, lines_path = corpus
    ds = LinesDataset(store_path, lines_path, max_width=WIDTH)
    return DataLoader(ds, BatchCreator(pad_to=WIDTH, seed=0), batch_size=2,
                      shuffle=True, num_workers=1)


def test_chunked_run_equals_monolithic(tool, corpus, tmp_path):
    iterations = 6
    mesh = tool._mesh()

    _, mono_state = tool.run_trainer(_task(), _loader(corpus), iterations, mesh,
                                     "mono", steps_per_call=2)

    part = str(tmp_path / "ckpt.part")
    chunk_state = None
    invocations = 0
    while chunk_state is None or int(chunk_state.step) < iterations:
        # fresh task + loader per invocation — exactly what a process restart sees
        _, chunk_state = tool.run_trainer(_task(), _loader(corpus), iterations, mesh,
                                          "chunk", steps_per_call=2, part_path=part, chunk=2)
        invocations += 1
        assert invocations <= 3, "chunked run failed to make progress"

    assert invocations == 3  # 6 iterations in 2-step chunks
    assert not os.path.exists(part)  # final invocation cleans up the part file
    assert int(mono_state.step) == int(chunk_state.step) == iterations

    mono_params = jax.device_get(mono_state.params)
    chunk_params = jax.device_get(chunk_state.params)
    flat_m = jax.tree_util.tree_leaves_with_path(mono_params)
    flat_c = jax.tree_util.tree_leaves(chunk_params)
    assert len(flat_m) == len(flat_c)
    for (path, m), c in zip(flat_m, flat_c):
        np.testing.assert_array_equal(m, c, err_msg=jax.tree_util.keystr(path))


def test_part_checkpoint_resumes_mid_chunk(tool, corpus, tmp_path):
    """An interrupt between chunks resumes from the persisted step count."""
    part = str(tmp_path / "ckpt.part")
    _, st = tool.run_trainer(_task(), _loader(corpus), 6, tool._mesh(), "c",
                             steps_per_call=2, part_path=part, chunk=4)
    assert int(st.step) == 4 and os.path.exists(part)
    _, st = tool.run_trainer(_task(), _loader(corpus), 6, tool._mesh(), "c",
                             steps_per_call=2, part_path=part, chunk=4)
    assert int(st.step) == 6 and not os.path.exists(part)
