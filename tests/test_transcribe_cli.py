"""transcribe CLI: checkpoint -> TSV transcriptions, greedy and beam+LM."""

import sys

import jax
import numpy as np
import pytest

from pero_pretraining_tpu.configs import BackboneConfig, TrainingConfig
from pero_pretraining_tpu.data.dataset import encode_image
from pero_pretraining_tpu.data.storage import SqliteStore
from pero_pretraining_tpu.pipelines.ctc import CTCTask
from pero_pretraining_tpu.utils.text import Charset

TINY = '{"type":"vit","model_dim":32,"num_heads":2,"num_blocks":1,"feedforward_dim":64,"max_len":64,"patch_size":[40,8]}'


@pytest.fixture
def setup(tmp_path, rng):
    store_path = str(tmp_path / "images.sqlite")
    lines_path = str(tmp_path / "ids.txt")
    store = SqliteStore(store_path, readonly=False)
    with open(lines_path, "w") as f:
        for i in range(6):
            img = rng.randint(0, 256, size=(40, int(rng.randint(80, 200)), 3)).astype(np.uint8)
            iid = f"line_{i}.png"
            store.put(iid, encode_image(img, ".png"))
            f.write(iid + "\n")
    store.commit()
    store.close()

    charset = Charset(list("abc"))
    charset_path = str(tmp_path / "charset.txt")
    charset.save(charset_path)

    task = CTCTask(BackboneConfig.from_definition({"type": "vit", **__import__("json").loads(TINY)}), charset, TrainingConfig(seed=0))
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch

    batch = synthetic_masked_batch(rng, batch_size=1, width=128, num_labels=4)
    variables = task.init_variables(jax.random.PRNGKey(0), batch)
    ckpt = str(tmp_path / "ckpt.msgpack")
    from flax import serialization

    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get({"params": variables["params"]})))
    return store_path, lines_path, charset_path, ckpt


def _transcribe(argv, monkeypatch, out):
    from pero_pretraining_tpu.pipelines.transcribe import main

    monkeypatch.setattr(sys, "argv", argv)
    assert main() == 0
    rows = [line.rstrip("\n").split("\t") for line in open(out)]
    assert len(rows) == 6
    for row in rows:
        assert row[0].startswith("line_")
    return {row[0]: row[1] if len(row) > 1 else "" for row in rows}


def test_transcribe_greedy_and_beam(setup, tmp_path, monkeypatch, rng):
    store_path, lines_path, charset_path, ckpt = setup
    base = [
        "transcribe", "--lines-path", lines_path, "--lmdb-path", store_path,
        "--checkpoint", ckpt, "--charset", charset_path, "--backbone", TINY,
        "--max-line-width", "256", "--num-workers", "1", "--batch-size", "4",
    ]
    greedy_out = str(tmp_path / "greedy.tsv")
    greedy = _transcribe(base + ["--output", greedy_out], monkeypatch, greedy_out)

    from pero_pretraining_tpu.utils.lm import CharNgramLM

    lm_path = str(tmp_path / "lm.json")
    CharNgramLM(order=3).fit(["abc", "cab", "bca"] * 5).save(lm_path)
    beam_out = str(tmp_path / "beam.tsv")
    beam = _transcribe(
        base + ["--output", beam_out, "--decoder", "beam", "--beam-width", "4",
                "--lm-path", lm_path, "--lm-weight", "0.3"],
        monkeypatch, beam_out,
    )
    assert set(greedy) == set(beam)  # same ids transcribed by both decoders
