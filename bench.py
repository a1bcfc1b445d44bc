"""Benchmark: masked-ViT pretraining throughput in text-lines/sec/chip.

Workload mirrors the reference's headline configuration (masked pretraining,
ViT backbone, batch 16, 2048-px lines -> 256 frames, 4096-label head;
reference: masked_pretraining/train.py:30-44 defaults).

Baseline: the reference is a PyTorch research codebase with no published
numbers (BASELINE.md); the north-star target is >=5x the PyTorch-CPU
reference throughput. The baseline leg builds the same-architecture model
with torch's own nn.TransformerEncoder on CPU and times fwd+bwd+Adam. The
measurement is cached in BENCH_BASELINE.json so repeat runs are cheap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH_SIZE = 16
WIDTH = 2048
NUM_LABELS = 4096
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def measure_tpu(steps: int = 30, warmup: int = 5) -> float:
    import jax

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    backbone = BackboneConfig(type="vit")
    head = HeadConfig(out_features=NUM_LABELS)
    training = TrainingConfig(masking_prob=0.15, bfloat16=True)

    task = MaskedTask(backbone, head, training)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    rng = np.random.RandomState(0)
    batches = [synthetic_masked_batch(rng, batch_size=BATCH_SIZE, width=WIDTH, num_labels=NUM_LABELS) for _ in range(4)]
    state = trainer.init_state(batches[0])

    for i in range(warmup):
        state, metrics = trainer.train_step(state, batches[i % len(batches)])
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer.train_step(state, batches[i % len(batches)])
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    return BATCH_SIZE * steps / elapsed


def measure_torch_cpu_baseline(steps: int = 3) -> float:
    """Equivalent architecture with torch's own modules on CPU (fwd+bwd+Adam).
    This stands in for the reference, which cannot run here as written (its
    mask tile is hard-coded to CUDA, reference models/transformers.py:34)."""
    import torch

    torch.manual_seed(0)
    d, heads, blocks, ff = 512, 4, 6, 2048
    s = WIDTH // 8

    patch_embed = torch.nn.Conv2d(3, d, kernel_size=(40, 8), stride=(40, 8))
    norm = torch.nn.LayerNorm(d)
    layer = torch.nn.TransformerEncoderLayer(d_model=d, nhead=heads, dim_feedforward=ff, dropout=0.0)
    encoder = torch.nn.TransformerEncoder(layer, num_layers=blocks)
    headm = torch.nn.Linear(d, NUM_LABELS)
    params = (
        list(patch_embed.parameters()) + list(norm.parameters()) + list(encoder.parameters()) + list(headm.parameters())
    )
    opt = torch.optim.Adam(params, lr=2e-4)

    x = torch.rand(BATCH_SIZE, 3, 40, WIDTH)
    labels = torch.randint(0, NUM_LABELS, (BATCH_SIZE, s))

    def step():
        opt.zero_grad()
        h = patch_embed(x).squeeze(2).permute(2, 0, 1)  # (S, N, D)
        h = norm(h)
        h = encoder(h)
        logits = headm(h).permute(1, 0, 2)
        loss = torch.nn.functional.cross_entropy(logits.reshape(-1, NUM_LABELS), labels.reshape(-1))
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    elapsed = time.perf_counter() - t0
    return BATCH_SIZE * steps / elapsed


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_lines_per_sec"]
    value = measure_torch_cpu_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "torch_cpu_lines_per_sec": value,
                "workload": f"masked ViT b{BATCH_SIZE} w{WIDTH} v{NUM_LABELS}, fwd+bwd+Adam",
            },
            f,
        )
    return value


def main():
    lines_per_sec = measure_tpu()
    baseline = get_baseline()
    print(
        json.dumps(
            {
                "metric": "pretraining_throughput",
                "value": round(lines_per_sec, 2),
                "unit": "text-lines/sec/chip",
                "vs_baseline": round(lines_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
