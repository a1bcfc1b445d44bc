"""Per-pipeline throughput benchmark (device-resident, value-fetch forced,
best of trials). Writes docs/bench_all.json (merging over existing legs, so
partial runs refresh only what they measured). Complements the driver-facing
bench.py headline.

    python tools/bench_all.py [--only REGEX]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ARGS = argparse.Namespace(only=None)


def want(name: str) -> bool:
    return ARGS.only is None or re.search(ARGS.only, name) is not None


def measure(trainer, batches, mesh, steps=20, trials=3, name=""):
    import jax

    from pero_pretraining_tpu.parallel.sharding import shard_batch

    print(f"[{name}] init...", flush=True)
    state = trainer.init_state(batches[0])
    state, m = trainer.train_step(state, batches[0])
    float(m["loss"])  # compile + channel
    print(f"[{name}] compiled", flush=True)
    dev = [shard_batch(b, mesh) for b in batches]
    best = 0.0
    bs = batches[0]["images"].shape[0]
    for _ in range(trials):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = trainer._train_step(state, dev[i % len(dev)])
        float(m["loss"])
        best = max(best, bs * steps / (time.perf_counter() - t0))
    print(f"[{name}] {best:.0f} lines/s", flush=True)
    return best


def main():
    import jax

    from pero_pretraining_tpu.configs import (
        AutoencoderConfig, BackboneConfig, HeadConfig, MeshConfig, TrainingConfig, VQConfig,
    )
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch, synthetic_paired_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.autoencoder import AutoencoderTask
    from pero_pretraining_tpu.pipelines.joint import JointEmbeddingTask
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.tester import numeric_batch
    from pero_pretraining_tpu.training.trainer import Trainer

    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    rng = np.random.RandomState(0)
    results = {}

    def masked_batches(**kw):
        return [numeric_batch(synthetic_masked_batch(rng, **kw)) for _ in range(4)]

    def paired_batches(**kw):
        return [numeric_batch(synthetic_paired_batch(rng, **kw)) for _ in range(4)]

    # masked ViT (flagship, reference defaults)
    t = TrainingConfig(bfloat16=True)
    if want("masked_vit_b16_w2048"):
        task = MaskedTask(BackboneConfig(type="vit"), HeadConfig(out_features=4096), t)
        results["masked_vit_b16_w2048"] = measure(
            Trainer(task, t, mesh=mesh), masked_batches(batch_size=16, width=2048, num_labels=4096), mesh, name="masked_vit_b16_w2048"
        )

    # masked VggT
    if want("masked_vggt_b16_w2048"):
        task = MaskedTask(BackboneConfig(type="vggt"), HeadConfig(out_features=4096), t)
        results["masked_vggt_b16_w2048"] = measure(
            Trainer(task, t, mesh=mesh), masked_batches(batch_size=16, width=2048, num_labels=4096), mesh, name="masked_vggt_b16_w2048"
        )

    # VQ-VAE tokenizer (reference defaults 1024x512)
    if want("vqvae_b32_w2048"):
        vq = AutoencoderConfig(type="vqvae", vq=VQConfig(num_embeddings=1024, embeddings_dim=512))
        task = AutoencoderTask(vq, t)
        results["vqvae_b32_w2048"] = measure(
            Trainer(task, t, mesh=mesh), masked_batches(batch_size=32, width=2048), mesh, steps=10, name="vqvae_b32_w2048"
        )

    # joint embedding (VICReg, MLP head)
    if want("vicreg_vit_b16_w1024"):
        task = JointEmbeddingTask(
            BackboneConfig(type="vit"), HeadConfig(type="mlp", hidden_dim=8192, num_layers=3), t, loss_type="vicreg"
        )
        results["vicreg_vit_b16_w1024"] = measure(
            Trainer(task, t, mesh=mesh), paired_batches(batch_size=16, width=1024), mesh, name="vicreg_vit_b16_w1024"
        )

    # joint embedding (NT-Xent, linear head — reference's other loss family)
    if want("ntxent_vit_b16_w1024"):
        task = JointEmbeddingTask(
            BackboneConfig(type="vit"), HeadConfig(out_features=4096), t, loss_type="ntxent"
        )
        results["ntxent_vit_b16_w1024"] = measure(
            Trainer(task, t, mesh=mesh), paired_batches(batch_size=16, width=1024), mesh, name="ntxent_vit_b16_w1024"
        )

    # CTC fine-tuning (the downstream transfer step)
    from pero_pretraining_tpu.data.batching import BatchCreator, CTCBatchCreator
    from pero_pretraining_tpu.pipelines.ctc import CTCTask
    from pero_pretraining_tpu.utils.text import Charset

    charset = Charset([chr(ord("a") + i) for i in range(26)])
    creator = CTCBatchCreator(charset, BatchCreator(pad_to=2048, seed=0), max_label_len=256)

    def ctc_batches(batch_size=16, width=2048, chars_per_line=64):
        out_batches = []
        for _ in range(4):
            items = []
            for _ in range(batch_size):
                text = "".join(rng.choice(charset.chars, size=chars_per_line))
                image = rng.randint(0, 256, size=(40, 8 * 2 * chars_per_line, 3)).astype(np.uint8)
                items.append({"image": image, "image2": None, "labels": None, "text": text, "image_id": text[:8]})
            out_batches.append(numeric_batch(creator.create_batch(items)))
        return out_batches

    ctc_task = CTCTask(BackboneConfig(type="vit"), charset, t)
    if want("ctc_finetune_vit_b16_w2048"):
        results["ctc_finetune_vit_b16_w2048"] = measure(
            Trainer(ctc_task, t, mesh=mesh), ctc_batches(), mesh, name="ctc_finetune_vit_b16_w2048"
        )

    # inference / serving legs. Scalar fetch only for the on-device legs —
    # paths stay on device so the number is chip throughput, not tunnel
    # bandwidth.
    import jax.numpy as jnp

    from pero_pretraining_tpu.parallel.sharding import shard_batch
    from pero_pretraining_tpu.utils.text import BLANK_ID

    infer_batches = ctc_batches()
    variables = ctc_task.init_variables(jax.random.PRNGKey(0), infer_batches[0])
    params = variables.pop("params")
    model_state = variables
    eval_rng = jax.random.PRNGKey(0)
    dev = [shard_batch(b, mesh) for b in infer_batches]
    bs = infer_batches[0]["images"].shape[0]

    def _time_leg(name, fn, steps=40, trials=3):
        s = fn(dev[0])
        float(s)  # compile + channel
        print(f"[{name}] compiled", flush=True)
        best = 0.0
        for _ in range(trials):
            t0 = time.perf_counter()
            for i in range(steps):
                s = fn(dev[i % len(dev)])
            float(s)
            best = max(best, bs * steps / (time.perf_counter() - t0))
        print(f"[{name}] {best:.0f} lines/s", flush=True)
        results[name] = best

    # (a) PURE greedy serving: forward + argmax only — the transcribe hot
    # path. (ADVICE r3: the previous "transcribe" figure also computed the
    # full optax.ctc_loss, understating serving throughput; host-side path
    # fetch/collapse is excluded — it overlaps device work in production.)
    @jax.jit
    def _serve_greedy(batch):
        images = jnp.asarray(batch["images"], jnp.float32) / 255.0
        logits, _ = ctc_task._apply(params, model_state, images, None, train=False)
        path = jnp.argmax(logits.astype(jnp.float32), axis=-1)
        path = jnp.where(jnp.asarray(batch["image_masks"]) == 1, path, BLANK_ID)
        return jnp.sum(path)

    if want("transcribe_greedy_vit_b16_w2048"):
        _time_leg("transcribe_greedy_vit_b16_w2048", _serve_greedy)

    # (b) evaluation step (forward + argmax + full CTC loss) — what
    # CTCTester runs per batch; kept for continuity with earlier rounds'
    # "transcribe" figure.
    @jax.jit
    def _eval_with_loss(batch):
        loss, aux = ctc_task.eval_step(params, model_state, batch, eval_rng)
        return loss + jnp.sum(aux["path"])

    if want("eval_greedy_with_ctc_loss_vit_b16_w2048"):
        _time_leg("eval_greedy_with_ctc_loss_vit_b16_w2048", _eval_with_loss)

    # (c) beam + char-LM serving (the QUALITY decode path): device forward ->
    # D2H fetch of (N, S, C) frame log-posteriors -> host prefix beam search
    # with LM fusion (utils/ctc_decode.py). Host-side Python dominates; the
    # number is per-CORE and scales with decode processes like the data
    # pipeline. Includes the log-prob fetch (tunneled ~100-400 MB/s here;
    # GB/s on production hosts).
    if want("transcribe_beam_lm_vit_b16_w2048"):
        from pero_pretraining_tpu.utils.ctc_decode import decode_batch
        from pero_pretraining_tpu.utils.lm import CharNgramLM

        lm_texts = ["".join(rng.choice(charset.chars, size=64)) for _ in range(200)]
        lm = CharNgramLM(order=4).fit(lm_texts)
        logp_fn = jax.jit(ctc_task.eval_logprobs_step)
        _, aux = logp_fn(params, model_state, dev[0], eval_rng)
        np.asarray(aux["log_probs"])  # compile + channel
        print("[transcribe_beam_lm_vit_b16_w2048] compiled", flush=True)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            _, aux = logp_fn(params, model_state, dev[0], eval_rng)
            decode_batch(
                np.asarray(aux["log_probs"]),
                np.asarray(infer_batches[0]["image_masks"]),
                charset,
                beam_width=12,
                lm=lm,
                lm_weight=0.4,
            )
            best = max(best, bs / (time.perf_counter() - t0))
        print(f"[transcribe_beam_lm_vit_b16_w2048] {best:.1f} lines/s", flush=True)
        results["transcribe_beam_lm_vit_b16_w2048"] = best

    out = {k: round(v, 1) for k, v in results.items()}
    docs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs")
    os.makedirs(docs, exist_ok=True)
    out_path = os.path.join(docs, "bench_all.json")
    merged = {}
    if os.path.exists(out_path):  # partial --only runs refresh, not erase
        with open(out_path) as f:
            merged = json.load(f)
    merged.pop("transcribe_vit_b16_w2048", None)  # legacy key: split into the greedy/eval legs
    merged.update({"unit": "text-lines/sec/chip (device-resident, bf16)", **out})
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--only", default=None,
                        help="regex over leg names; unmatched legs are skipped and their "
                             "previously committed numbers kept in bench_all.json")
    ARGS = parser.parse_args()
    raise SystemExit(main())
