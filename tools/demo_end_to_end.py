"""End-to-end demonstration on synthetic rendered text.

Reproduces the reference paper's core loop at toy scale, producing committed
qualitative artifacts (docs/demo/) like the reference's visualizations/:

1. render a corpus of text-line images (PIL bitmap font, random words),
2. train a VQ-VAE tokenizer and produce VQ-code labels (config 2),
3. masked-pretrain a ViT on those labels,
4. CTC fine-tune a recognizer on a SMALL labeled subset, from scratch vs
   from the pretrained backbone — the transfer-learning benefit is the
   paper's headline claim,
5. n-gram collage of VQ codes ("do codes mean visual things").

Writes docs/demo/summary.json + PNGs. Run: python tools/demo_end_to_end.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs", "demo")
WIDTH = 512
HEIGHT = 40
CHARS = "abcdefghijklmnopqrstuvwxyz "


def render_line(rng, text: str) -> np.ndarray:
    """Render text to a (40, W, 3) uint8 BGR image with PIL's bitmap font."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    img = Image.new("L", (8 * len(text) + 16, HEIGHT), color=255)
    draw = ImageDraw.Draw(img)
    draw.text((4, 12), text, fill=0, font=font)
    arr = np.asarray(img)
    arr = np.stack([arr] * 3, axis=-1)
    # light noise so the tokenizer has texture to model
    noise = rng.randn(*arr.shape) * 6
    return np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def make_corpus(tmp, rng, n_train=400, n_test=80):
    from pero_pretraining_tpu.data.dataset import encode_image
    from pero_pretraining_tpu.data.storage import SqliteStore

    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "pack", "my", "box",
             "with", "five", "dozen", "liquor", "jugs", "vex", "bright", "wizards"]
    store_path = os.path.join(tmp, "images.sqlite")
    store = SqliteStore(store_path, readonly=False)
    splits = {}
    for split, count in (("trn", n_train), ("tst", n_test)):
        ids, texts = [], []
        for i in range(count):
            text = " ".join(rng.choice(words, size=rng.randint(2, 6)))
            img = render_line(rng, text)[:, :WIDTH]
            image_id = f"{split}_{i:04d}.png"
            store.put(image_id, encode_image(img, ".png"))
            ids.append(image_id)
            texts.append(text)
        splits[split] = (ids, texts)
    store.commit()
    store.close()

    lines = {}
    for split, (ids, texts) in splits.items():
        lines_path = os.path.join(tmp, f"{split}.lines")
        with open(lines_path, "w") as f:
            f.writelines(i + "\n" for i in ids)
        tsv_path = os.path.join(tmp, f"{split}.tsv")
        with open(tsv_path, "w") as f:
            f.writelines(f"{i}\t{t}\n" for i, t in zip(ids, texts))
        lines[split] = (lines_path, tsv_path)
    return store_path, lines


def run_trainer(task, loader, iterations, mesh, log_name, steps_per_call=5):
    import jax

    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    trainer = Trainer(task, task.training_config, mesh=mesh)
    first = next(iter(loader))
    state = trainer.init_state(first)

    def forever():
        while True:
            yield from (numeric_batch(b) for b in loader)

    t0 = time.time()
    state = trainer.fit(state, forever(), start_iteration=0, end_iteration=iterations,
                        view_step=0, steps_per_call=steps_per_call)
    print(f"  {log_name}: {iterations} iters in {time.time() - t0:.1f}s")
    return trainer, state


def main():
    import jax

    from pero_pretraining_tpu.configs import (
        AutoencoderConfig, BackboneConfig, HeadConfig, MeshConfig, TrainingConfig, VQConfig,
    )
    from pero_pretraining_tpu.data.batching import BatchCreator, CTCBatchCreator
    from pero_pretraining_tpu.data.dataset import LinesDataset, TranscriptionDataset
    from pero_pretraining_tpu.data.loader import DataLoader
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.autoencoder import AutoencoderTask
    from pero_pretraining_tpu.pipelines.ctc import CTCTask, CTCTester
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.pipelines.visualizers import MaskedVisualizer
    from pero_pretraining_tpu.training.checkpoint import save_checkpoint
    from pero_pretraining_tpu.utils.text import Charset
    from pero_pretraining_tpu.utils.visualizer import write_png

    os.makedirs(OUT, exist_ok=True)
    tmp = os.path.join(OUT, "corpus")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.RandomState(0)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    summary = {}

    print("1) corpus")
    store_path, lines = make_corpus(tmp, rng)

    print("2) VQ-VAE tokenizer")
    vq_cfg = AutoencoderConfig(
        type="vqvae", base_channels=16, decoder_base_channels=64, vq=VQConfig(num_embeddings=64, embeddings_dim=64)
    )
    vq_training = TrainingConfig(learning_rate=3e-4, warmup_iterations=0, batch_size=16)
    vq_task = AutoencoderTask(vq_cfg, vq_training)
    ds = LinesDataset(store_path, lines["trn"][0], max_width=WIDTH)
    loader = DataLoader(ds, BatchCreator(pad_to=WIDTH, seed=0), batch_size=16, shuffle=True, num_workers=4)
    vq_trainer, vq_state = run_trainer(vq_task, loader, 300, mesh, "vqvae")
    vq_ckpt = os.path.join(tmp, "vqvae.msgpack")
    save_checkpoint(vq_state, vq_ckpt)

    print("3) VQ labels")
    from pero_pretraining_tpu.scripts.produce_vqvae_labels import compute_labels
    from pero_pretraining_tpu.models.autoencoders import build_autoencoder
    from pero_pretraining_tpu.scripts.common import init_dataset, save_labels

    vq_model = build_autoencoder(vq_cfg)
    variables = {"params": jax.device_get(vq_state.params), **jax.device_get(vq_state.model_state)}
    for split in ("trn", "tst"):
        label_loader = init_dataset(store_path, lines[split][0], 16, max_width=WIDTH, num_workers=4)
        labels = compute_labels(vq_model, variables, label_loader)
        save_labels(labels, os.path.join(tmp, f"vq_labels.{split}"))

    print("3b) FQ labels (pero_vgg features + k-means) for pretraining targets")
    from pero_pretraining_tpu.scripts.common import init_feature_model
    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans
    from pero_pretraining_tpu.ops.vq import vq_assign
    import jax.numpy as jnp

    encode = init_feature_model("pero_vgg", None)
    feats = []
    feat_loader = init_dataset(store_path, lines["trn"][0], 16, max_width=WIDTH, num_workers=4)
    per_line = {}
    for split in ("trn", "tst"):
        sl = init_dataset(store_path, lines[split][0], 16, max_width=WIDTH, num_workers=4)
        rows = {}
        for batch in sl:
            frames = np.asarray(encode(jnp.asarray(batch["images"], jnp.float32) / 255.0), np.float32)
            for lid, lmask, lf in zip(batch["ids"], batch["image_masks"], frames):
                rows[lid] = lf[lmask == 1]
        per_line[split] = rows
    all_feats = np.vstack(list(per_line["trn"].values()))
    centers, _ = fit_minibatch_kmeans(all_feats, 64, batch_size=4096, epochs=5, seed=0)
    centers_dev = jnp.asarray(centers)
    for split in ("trn", "tst"):
        fq = {lid: np.asarray(vq_assign(jnp.asarray(f), centers_dev)).tolist() for lid, f in per_line[split].items()}
        save_labels(fq, os.path.join(tmp, f"fq_labels.{split}"))

    print("4) masked pretraining on FQ labels")
    backbone_cfg = BackboneConfig(type="vit", model_dim=256, num_heads=4, num_blocks=4, feedforward_dim=512, max_len=128)
    m_training = TrainingConfig(learning_rate=3e-4, warmup_iterations=100, batch_size=16, masking_prob=0.3)
    m_task = MaskedTask(backbone_cfg, HeadConfig(in_features=256, out_features=64), m_training)
    m_ds = LinesDataset(store_path, os.path.join(tmp, "fq_labels.trn"), max_width=WIDTH)
    m_loader = DataLoader(m_ds, BatchCreator(pad_to=WIDTH, seed=0), batch_size=16, shuffle=True, num_workers=4)
    m_trainer, m_state = run_trainer(m_task, m_loader, 2000, mesh, "masked")
    pretrained_ckpt = os.path.join(tmp, "pretrained.msgpack")
    save_checkpoint(m_state, pretrained_ckpt)

    from pero_pretraining_tpu.training.tester import Tester

    tst_ds = LinesDataset(store_path, os.path.join(tmp, "fq_labels.tst"), max_width=WIDTH)
    tst_loader = DataLoader(tst_ds, BatchCreator(pad_to=WIDTH, seed=0), batch_size=16, shuffle=False, num_workers=4)
    m_result = Tester(m_task, tst_loader).test(m_state)
    summary["masked_test"] = m_result
    print(f"  masked tst: loss {m_result['loss']:.4f}, top-1 err {m_result['errors_1']:.3f}")

    vis = MaskedVisualizer(m_task, tst_loader, show_masked_images=True)
    write_png(os.path.join(OUT, "masked_predictions.png"), vis.visualize(m_state)[:800])

    print("5) CTC fine-tune: scratch vs pretrained (small labeled subset)")
    small_tsv = os.path.join(tmp, "trn_small.tsv")
    with open(lines["trn"][1]) as f:
        rows = f.readlines()[:24]
    with open(small_tsv, "w") as f:
        f.writelines(rows)

    charset = Charset(list(CHARS))
    ctc_results = {}
    # full fine-tune (scratch vs pretrained) AND frozen-backbone linear
    # probes (random vs pretrained features) — the probe isolates
    # representation quality from optimization noise
    for mode in ("scratch", "pretrained", "probe_random", "probe_pretrained"):
        lr = 1e-3 if mode.startswith("probe") else 2e-4
        c_training = TrainingConfig(learning_rate=lr, warmup_iterations=30, batch_size=16)
        c_task = CTCTask(backbone_cfg, charset, c_training)
        c_ds = TranscriptionDataset(store_path, small_tsv, max_width=WIDTH)
        creator = CTCBatchCreator(charset, BatchCreator(pad_to=WIDTH, seed=0), max_label_len=64)
        c_loader = DataLoader(c_ds, creator, batch_size=16, shuffle=True, num_workers=4)

        from pero_pretraining_tpu.training.trainer import Trainer
        from pero_pretraining_tpu.training.tester import numeric_batch

        trainer = Trainer(c_task, c_training, mesh=mesh)
        first = next(iter(c_loader))
        variables = c_task.init_variables(jax.random.PRNGKey(0), first)
        if mode in ("pretrained", "probe_pretrained"):
            variables = c_task.load_pretrained_backbone(variables, pretrained_ckpt)
        if mode.startswith("probe"):
            import optax

            # freeze the backbone: adam on the head, zero elsewhere
            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "train" if "ctc_head" in str(path[0]) else "freeze", params
                )

            trainer.tx = optax.multi_transform(
                {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, label_fn
            )
            trainer._train_step = jax.jit(trainer._step, donate_argnums=(0,))
            trainer._train_many = jax.jit(trainer._multi_step, donate_argnums=(0,))

        from pero_pretraining_tpu.training.state import TrainState

        variables = dict(variables)
        params = jax.device_put(variables.pop("params"))
        model_state = jax.device_put(variables)
        opt_state = jax.jit(trainer.tx.init)(params)
        state = TrainState.create(params, model_state, opt_state, 0)

        def forever():
            while True:
                yield from (numeric_batch(b) for b in c_loader)

        state = trainer.fit(state, forever(), start_iteration=0, end_iteration=1200, view_step=0, steps_per_call=5)

        c_tst = TranscriptionDataset(store_path, lines["tst"][1], max_width=WIDTH)
        c_tst_loader = DataLoader(c_tst, creator, batch_size=16, shuffle=False, num_workers=4)
        result = CTCTester(c_task, c_tst_loader).test(state)
        ctc_results[mode] = result
        print(f"  CTC {mode}: tst loss {result['loss']:.4f}, CER {result['cer']:.4f}")

        if mode == "pretrained":
            # beam search + char-LM shallow fusion on the same trained model
            # (the PERO-OCR-production decoder class; greedy above for parity)
            from pero_pretraining_tpu.utils.lm import CharNgramLM

            lm = CharNgramLM(order=4).fit(c_ds.texts())
            beam = CTCTester(c_task, c_tst_loader, decoder="beam", beam_width=12, lm=lm, lm_weight=0.4)
            beam_result = beam.test(state)
            ctc_results["pretrained_beam_lm"] = beam_result
            print(f"  CTC pretrained+beam+LM: tst loss {beam_result['loss']:.4f}, CER {beam_result['cer']:.4f}")
    summary["ctc"] = ctc_results

    print("6) n-gram collage")
    from pero_pretraining_tpu.scripts.calculate_ngrams import calculate_ngrams, save_ngrams
    from pero_pretraining_tpu.scripts.common import load_labels
    from pero_pretraining_tpu.scripts.visualize_ngrams import create_image, search_ngrams
    from pero_pretraining_tpu.data.storage import open_store

    labels = load_labels(os.path.join(tmp, "fq_labels.trn"))
    ngrams = calculate_ngrams(labels, 3)
    top = [ng for ng, _ in sorted(ngrams.items(), key=lambda kv: kv[1], reverse=True)[:12]]
    with open_store(store_path) as store:
        crops = search_ngrams(labels, top, store, 8, max_samples=16)
    collage = create_image(top, crops, crops_per_line=12)
    if collage is not None:
        write_png(os.path.join(OUT, "fq_3gram_collage.png"), collage)

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print("\nSummary:", json.dumps(summary, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
