"""Pretraining-transfer experiment on a rendered printed-text corpus.

The reference paper's headline result (arXiv:2405.00420 via reference
README.md:3-9) is that self-supervised pretraining on unlabeled line images
cuts fine-tuned CER when labeled data is scarce. The real datasets (Bentham,
historical print) are not redistributable, so this experiment reproduces the
protocol on a locally rendered printed-text analogue (data/render.py):

1. render an unlabeled corpus of TTF text lines (+ held-out labeled test set),
2. train an AE tokenizer, k-means-quantize its features (the paper's
   Post-Quantized AE method) -> per-frame discrete labels,
3. masked-pretrain a ViT on those labels,
4. CTC fine-tune at several labeled-line budgets, from scratch vs from the
   pretrained backbone; report test CER per (budget, init),
5. write docs/demo/rendered_summary.json + qualitative PNGs.

Run: python tools/rendered_experiment.py  (~15-30 min on one v5e chip)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs", "demo")
WIDTH = 512
LABEL_STEP = 8


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-unlabeled", type=int, default=3000)
    p.add_argument("--n-test", type=int, default=240)
    p.add_argument("--budgets", type=str, default="48,192", help="labeled-line budgets (comma-separated)")
    p.add_argument("--ae-iterations", type=int, default=800)
    p.add_argument("--pretrain-iterations", type=int, default=4000)
    p.add_argument("--finetune-iterations", type=int, default=2500)
    p.add_argument("--num-clusters", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=OUT)
    return p.parse_args()


def run_trainer(task, loader, iterations, mesh, log_name, steps_per_call=10):
    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    trainer = Trainer(task, task.training_config, mesh=mesh)
    state = trainer.init_state(next(iter(loader)))

    def forever():
        while True:
            yield from (numeric_batch(b) for b in loader)

    t0 = time.time()
    state = trainer.fit(state, forever(), start_iteration=0, end_iteration=iterations,
                        view_step=0, steps_per_call=steps_per_call)
    print(f"  {log_name}: {iterations} iters in {time.time() - t0:.1f}s", flush=True)
    return trainer, state


def finetune_ctc(backbone_cfg, charset, store_path, trn_tsv, tst_tsv, iterations, mesh,
                 pretrained_ckpt=None, seed=0):
    """One CTC fine-tune leg -> (state, task, test metrics)."""
    import jax

    from pero_pretraining_tpu.configs import TrainingConfig
    from pero_pretraining_tpu.data.batching import BatchCreator, CTCBatchCreator
    from pero_pretraining_tpu.data.dataset import TranscriptionDataset
    from pero_pretraining_tpu.data.loader import DataLoader
    from pero_pretraining_tpu.pipelines.ctc import CTCTask, CTCTester
    from pero_pretraining_tpu.training.state import TrainState
    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    training = TrainingConfig(learning_rate=2e-4, warmup_iterations=100, batch_size=16, seed=seed)
    task = CTCTask(backbone_cfg, charset, training)
    ds = TranscriptionDataset(store_path, trn_tsv, max_width=WIDTH)
    creator = CTCBatchCreator(charset, BatchCreator(pad_to=WIDTH, seed=seed), max_label_len=64)
    loader = DataLoader(ds, creator, batch_size=16, shuffle=True, num_workers=4)

    trainer = Trainer(task, training, mesh=mesh)
    variables = task.init_variables(jax.random.PRNGKey(seed), next(iter(loader)))
    if pretrained_ckpt is not None:
        variables = task.load_pretrained_backbone(variables, pretrained_ckpt)
    variables = dict(variables)
    params = jax.device_put(variables.pop("params"))
    model_state = jax.device_put(variables)
    opt_state = jax.jit(trainer.tx.init)(params)
    state = TrainState.create(params, model_state, opt_state, seed)

    def forever():
        while True:
            yield from (numeric_batch(b) for b in loader)

    t0 = time.time()
    state = trainer.fit(state, forever(), start_iteration=0, end_iteration=iterations,
                        view_step=0, steps_per_call=10)

    tst = TranscriptionDataset(store_path, tst_tsv, max_width=WIDTH)
    tst_loader = DataLoader(tst, creator, batch_size=16, shuffle=False, num_workers=4)
    result = CTCTester(task, tst_loader).test(state)
    result["train_seconds"] = round(time.time() - t0, 1)
    return state, task, tst_loader, result


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from pero_pretraining_tpu.configs import (
        AutoencoderConfig, BackboneConfig, HeadConfig, MeshConfig, TrainingConfig,
    )
    from pero_pretraining_tpu.data.batching import BatchCreator
    from pero_pretraining_tpu.data.dataset import LinesDataset
    from pero_pretraining_tpu.data.loader import DataLoader
    from pero_pretraining_tpu.data.render import build_corpus
    from pero_pretraining_tpu.ops.kmeans import fit_minibatch_kmeans
    from pero_pretraining_tpu.ops.vq import vq_assign
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.autoencoder import AutoencoderTask
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.pipelines.visualizers import MaskedVisualizer
    from pero_pretraining_tpu.scripts.common import init_dataset, init_feature_model, save_labels
    from pero_pretraining_tpu.training.checkpoint import save_checkpoint
    from pero_pretraining_tpu.training.tester import Tester
    from pero_pretraining_tpu.utils.text import Charset
    from pero_pretraining_tpu.utils.visualizer import write_png

    os.makedirs(args.out, exist_ok=True)
    corpus_dir = os.path.join(args.out, "rendered_corpus")
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    budgets = [int(b) for b in args.budgets.split(",")]
    summary = {"config": vars(args)}

    print("1) rendered corpus", flush=True)
    t0 = time.time()
    corpus = build_corpus(corpus_dir, n_train=args.n_unlabeled, n_test=args.n_test,
                          seed=args.seed, max_width=WIDTH)
    store_path = corpus["store"]
    trn_lines, trn_tsv = corpus["lines"]["trn"]
    tst_lines, tst_tsv = corpus["lines"]["tst"]
    print(f"  {args.n_unlabeled}+{args.n_test} lines in {time.time() - t0:.1f}s", flush=True)

    # qualitative sample strip (first 10 test lines)
    from pero_pretraining_tpu.data.dataset import TranscriptionDataset

    sample_ds = TranscriptionDataset(store_path, tst_tsv, max_width=WIDTH)
    rows = []
    for i in range(min(10, len(sample_ds))):
        img = sample_ds[i]["image"]
        pad = np.full((img.shape[0], WIDTH - img.shape[1], 3), 255, np.uint8)
        rows.append(np.concatenate([img, pad], axis=1))
        rows.append(np.full((4, WIDTH, 3), 128, np.uint8))
    write_png(os.path.join(args.out, "rendered_samples.png"), np.concatenate(rows, axis=0))

    print("2) PQ-AE targets: AE tokenizer + k-means over its features", flush=True)
    ae_cfg = AutoencoderConfig(type="ae", base_channels=32, decoder_base_channels=128)
    ae_task = AutoencoderTask(ae_cfg, TrainingConfig(learning_rate=3e-4, warmup_iterations=0, batch_size=16, seed=args.seed))
    ae_ds = LinesDataset(store_path, trn_lines, max_width=WIDTH)
    ae_loader = DataLoader(ae_ds, BatchCreator(pad_to=WIDTH, seed=args.seed), batch_size=16, shuffle=True, num_workers=4)
    _, ae_state = run_trainer(ae_task, ae_loader, args.ae_iterations, mesh, "ae")
    ae_ckpt = os.path.join(corpus_dir, "ae.msgpack")
    save_checkpoint(ae_state, ae_ckpt)

    ae_def = json.dumps({"type": "ae", "base_channels": 32, "decoder_base_channels": 128})
    encode = init_feature_model(ae_def, ae_ckpt)
    per_line = {}
    for split, lines_path in (("trn", trn_lines), ("tst", tst_lines)):
        rows = {}
        for batch in init_dataset(store_path, lines_path, 16, max_width=WIDTH, num_workers=4):
            frames = np.asarray(encode(jnp.asarray(batch["images"], jnp.float32) / 255.0), np.float32)
            for lid, lmask, lf in zip(batch["ids"], batch["image_masks"], frames):
                rows[lid] = lf[lmask == 1]
        per_line[split] = rows
    all_feats = np.vstack(list(per_line["trn"].values()))
    print(f"  {all_feats.shape[0]} frames x {all_feats.shape[1]} dims", flush=True)
    centers, inertia = fit_minibatch_kmeans(all_feats, args.num_clusters, batch_size=8192, epochs=8, seed=args.seed)
    centers_dev = jnp.asarray(centers)
    for split in ("trn", "tst"):
        labels = {lid: np.asarray(vq_assign(jnp.asarray(f), centers_dev)).tolist()
                  for lid, f in per_line[split].items()}
        save_labels(labels, os.path.join(corpus_dir, f"pqae_labels.{split}"))

    print("3) masked pretraining on PQ-AE labels", flush=True)
    backbone_cfg = BackboneConfig(type="vit", model_dim=256, num_heads=4, num_blocks=4,
                                  feedforward_dim=1024, max_len=128)
    m_training = TrainingConfig(learning_rate=3e-4, warmup_iterations=200, batch_size=16,
                                masking_prob=0.3, seed=args.seed)
    m_task = MaskedTask(backbone_cfg, HeadConfig(in_features=256, out_features=args.num_clusters), m_training)
    m_ds = LinesDataset(store_path, os.path.join(corpus_dir, "pqae_labels.trn"), max_width=WIDTH)
    m_loader = DataLoader(m_ds, BatchCreator(pad_to=WIDTH, seed=args.seed), batch_size=16, shuffle=True, num_workers=4)
    _, m_state = run_trainer(m_task, m_loader, args.pretrain_iterations, mesh, "masked")
    pretrained_ckpt = os.path.join(corpus_dir, "pretrained.msgpack")
    save_checkpoint(m_state, pretrained_ckpt)

    tst_ds = LinesDataset(store_path, os.path.join(corpus_dir, "pqae_labels.tst"), max_width=WIDTH)
    tst_loader = DataLoader(tst_ds, BatchCreator(pad_to=WIDTH, seed=args.seed), batch_size=16, shuffle=False, num_workers=4)
    m_result = Tester(m_task, tst_loader).test(m_state)
    summary["masked_test"] = m_result
    print(f"  masked tst: loss {m_result['loss']:.4f}, top-1 err {m_result['errors_1']:.3f}", flush=True)
    vis = MaskedVisualizer(m_task, tst_loader, show_masked_images=True)
    write_png(os.path.join(args.out, "rendered_masked_predictions.png"), vis.visualize(m_state)[:800])

    print("4) CTC fine-tuning: scratch vs pretrained per labeled budget", flush=True)
    charset = Charset(corpus["charset"])
    with open(trn_tsv) as f:
        all_rows = f.readlines()
    ctc = {}
    for budget in budgets:
        small_tsv = os.path.join(corpus_dir, f"trn_{budget}.tsv")
        with open(small_tsv, "w") as f:
            f.writelines(all_rows[:budget])
        for mode in ("scratch", "pretrained"):
            ckpt = pretrained_ckpt if mode == "pretrained" else None
            state, task, ctc_tst_loader, result = finetune_ctc(
                backbone_cfg, charset, store_path, small_tsv, tst_tsv,
                args.finetune_iterations, mesh, pretrained_ckpt=ckpt, seed=args.seed)
            ctc[f"{mode}_{budget}"] = result
            print(f"  {mode} @ {budget} lines: tst loss {result['loss']:.4f}, CER {result['cer']:.4f}", flush=True)
            if mode == "pretrained" and budget == max(budgets):
                from pero_pretraining_tpu.pipelines.ctc import CTCTester
                from pero_pretraining_tpu.utils.lm import CharNgramLM

                lm = CharNgramLM(order=4).fit([r.split("\t", 1)[1].strip() for r in all_rows])
                beam = CTCTester(task, ctc_tst_loader, decoder="beam", beam_width=12, lm=lm, lm_weight=0.4)
                ctc[f"pretrained_{budget}_beam_lm"] = beam.test(state)
                print(f"  pretrained+beam+LM @ {budget}: CER {ctc[f'pretrained_{budget}_beam_lm']['cer']:.4f}", flush=True)
    summary["ctc"] = ctc

    with open(os.path.join(args.out, "rendered_summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print("\nSummary:", json.dumps(summary, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
