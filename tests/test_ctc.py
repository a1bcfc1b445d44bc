"""CTC fine-tuning tests: text utils, loss vs torch.nn.CTCLoss, overfit to
near-zero CER on a tiny synthetic recognizer task, backbone grafting."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
from pero_pretraining_tpu.data.batching import BatchCreator, CTCBatchCreator
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.ctc import CTCTask, CTCTester
from pero_pretraining_tpu.training.trainer import Trainer
from pero_pretraining_tpu.utils.text import (
    Charset,
    character_error_rate,
    collapse_ctc,
    edit_distance,
)

TINY_BACKBONE = BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=128)


def test_charset_roundtrip(tmp_path):
    charset = Charset.from_texts(["hello", "world"])
    assert len(charset) == len(set("helloworld")) + 1
    ids = charset.encode("hello")
    assert charset.decode(ids) == "hello"
    assert 0 not in ids  # blank reserved

    path = str(tmp_path / "charset.txt")
    charset.save(path)
    loaded = Charset.load(path)
    assert loaded.chars == charset.chars


def test_collapse_and_edit_distance():
    assert collapse_ctc([0, 1, 1, 0, 2, 2, 2, 0, 1]) == [1, 2, 1]
    assert collapse_ctc([0, 0, 0]) == []
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert character_error_rate(["abc"], ["abc"]) == 0.0
    assert character_error_rate(["axc"], ["abc"]) == pytest.approx(1 / 3)


def test_ctc_loss_matches_torch(rng):
    """optax.ctc_loss == torch.nn.CTCLoss on identical inputs."""
    import optax

    n, t, k, l = 3, 20, 8, 5
    logits = rng.randn(n, t, k).astype(np.float32)
    labels = rng.randint(1, k, size=(n, l)).astype(np.int32)
    label_lens = np.array([5, 3, 4])
    label_paddings = np.ones((n, l), np.float32)
    for i, ll in enumerate(label_lens):
        label_paddings[i, :ll] = 0.0

    ours = optax.ctc_loss(
        jnp.asarray(logits), jnp.zeros((n, t), jnp.float32), jnp.asarray(labels), jnp.asarray(label_paddings), blank_id=0
    )

    log_probs = torch.tensor(logits).log_softmax(-1).permute(1, 0, 2)  # (T, N, K)
    ctc = torch.nn.CTCLoss(blank=0, reduction="none")
    ref = ctc(
        log_probs,
        torch.tensor(labels),
        torch.full((n,), t, dtype=torch.long),
        torch.tensor(label_lens, dtype=torch.long),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def _glyph_batch(rng, charset, n=8, frames_per_char=2, chars_per_line=6, width=256):
    """Synthetic 'text': each character draws a distinct vertical-stripe glyph
    (deterministic pixels), so a tiny model can learn frame -> char."""
    items = []
    glyphs = {}
    for c in charset.chars:
        g = rng.randint(0, 256, size=(40, 8 * frames_per_char, 3)).astype(np.uint8)
        glyphs[c] = g
    for _ in range(n):
        text = "".join(rng.choice(list(charset.chars), size=chars_per_line))
        image = np.concatenate([glyphs[c] for c in text], axis=1)
        items.append({"image": image, "image2": None, "labels": None, "text": text, "image_id": text})
    creator = CTCBatchCreator(charset, BatchCreator(pad_to=width, seed=0), max_label_len=16)
    return creator.create_batch(items)


def test_ctc_overfit_and_cer(rng):
    charset = Charset(list("abcd"))
    batch = _glyph_batch(rng, charset)

    training = TrainingConfig(learning_rate=3e-3, warmup_iterations=10, seed=0)
    task = CTCTask(TINY_BACKBONE, charset, training)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    from pero_pretraining_tpu.training.tester import numeric_batch

    state = trainer.init_state(batch)
    losses = []
    for _ in range(150):
        state, metrics = trainer.train_step(state, numeric_batch(batch))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.2, f"CTC did not overfit: {losses[0]:.3f} -> {losses[-1]:.3f}"

    tester = CTCTester(task, [batch])
    result = tester.test(state)
    assert result["cer"] < 0.2, f"CER too high after overfit: {result['cer']}"

    # beam decoding on the same trained model is at least as good as greedy,
    # and LM fusion over the training texts keeps it there
    from pero_pretraining_tpu.utils.lm import CharNgramLM

    beam = CTCTester(task, [batch], decoder="beam", beam_width=8)
    beam_result = beam.test(state)
    assert beam_result["cer"] <= result["cer"] + 1e-9
    lm = CharNgramLM(order=3).fit(batch["texts"])
    fused = CTCTester(task, [batch], decoder="beam", beam_width=8, lm=lm, lm_weight=0.3)
    fused_result = fused.test(state)
    assert fused_result["cer"] <= result["cer"] + 1e-9


def test_backbone_grafting(rng, tmp_path):
    """Params from a masked-pretraining checkpoint land in the CTC model."""
    from flax import serialization
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.pipelines.masked import MaskedTask

    head = HeadConfig(in_features=64, out_features=32)
    training = TrainingConfig(seed=0)
    masked = MaskedTask(TINY_BACKBONE, head, training)
    mbatch = synthetic_masked_batch(rng, batch_size=2, width=128, num_labels=32)
    mvars = dict(masked.init_variables(jax.random.PRNGKey(0), mbatch))

    ckpt = str(tmp_path / "pretrained.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get({"params": mvars["params"]})))

    charset = Charset(list("xyz"))
    task = CTCTask(TINY_BACKBONE, charset, training)
    cbatch = _glyph_batch(rng, charset, n=2, width=128)
    cvars = task.init_variables(jax.random.PRNGKey(1), cbatch)
    grafted = task.load_pretrained_backbone(cvars, ckpt)

    src = jax.tree_util.tree_leaves(mvars["params"]["backbone"])
    dst = jax.tree_util.tree_leaves(grafted["params"]["backbone"])
    for a, b in zip(src, dst):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # head stays freshly initialized
    assert "ctc_head" in grafted["params"]


def test_backbone_grafting_converts_block_layouts(rng, tmp_path):
    """A STACKED (pipeline-layout) pretraining checkpoint grafts into a
    per-block CTC model and vice versa — layouts auto-convert."""
    import dataclasses

    from flax import serialization
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.pipelines.masked import MaskedTask

    head = HeadConfig(in_features=64, out_features=32)
    training = TrainingConfig(seed=0)
    stacked_cfg = dataclasses.replace(TINY_BACKBONE, stacked_blocks=True)

    masked = MaskedTask(stacked_cfg, head, training)
    mbatch = synthetic_masked_batch(rng, batch_size=2, width=128, num_labels=32)
    mvars = dict(masked.init_variables(jax.random.PRNGKey(0), mbatch))
    ckpt = str(tmp_path / "stacked.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get({"params": mvars["params"]})))

    charset = Charset(list("xyz"))
    cbatch = _glyph_batch(rng, charset, n=2, width=128)

    # stacked checkpoint -> per-block CTC model
    task = CTCTask(TINY_BACKBONE, charset, training)
    cvars = task.init_variables(jax.random.PRNGKey(1), cbatch)
    grafted = task.load_pretrained_backbone(cvars, ckpt)
    bb = grafted["params"]["backbone"]
    assert "stack" not in bb and "block0" in bb
    np.testing.assert_array_equal(
        np.asarray(mvars["params"]["backbone"]["stack"]["blocks"]["attention"]["qkv"]["kernel"][0]),
        np.asarray(bb["block0"]["attention"]["qkv"]["kernel"]),
    )
    # the grafted model must actually run
    loss, _ = task.loss_fn(grafted["params"], {}, cbatch, jax.random.PRNGKey(2), False)
    assert np.isfinite(float(loss))

    # per-block checkpoint -> stacked CTC model
    masked_pb = MaskedTask(TINY_BACKBONE, head, training)
    pvars = dict(masked_pb.init_variables(jax.random.PRNGKey(3), mbatch))
    ckpt2 = str(tmp_path / "perblock.msgpack")
    with open(ckpt2, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get({"params": pvars["params"]})))
    task_s = CTCTask(stacked_cfg, charset, training)
    svars = task_s.init_variables(jax.random.PRNGKey(4), cbatch)
    grafted_s = task_s.load_pretrained_backbone(svars, ckpt2)
    bb_s = grafted_s["params"]["backbone"]
    assert "stack" in bb_s and "block0" not in bb_s
    loss, _ = task_s.loss_fn(grafted_s["params"], {}, cbatch, jax.random.PRNGKey(5), False)
    assert np.isfinite(float(loss))
