"""Flagship-step ablation harness: time train-step variants on the real TPU.

Times the headline masked-ViT configuration (b16 w2048 v4096 bf16) across
framework knobs, using scan-fused multi-step programs (immune to per-step
dispatch jitter on tunneled transports; see .claude/skills/verify/SKILL.md).

Run AFTER other CPU work is quiet (1-core host: dispatch contention corrupts
timings):  python tools/step_ablation.py [--steps 24] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BATCH_SIZE = 16
WIDTH = 2048
NUM_LABELS = 4096


def build(attention_impl="xla", remat=False, fused_ce=False, grad_accum=1, bfloat16=True, moments_dtype="float32",
          backbone_type="vit"):
    import jax

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    task = MaskedTask(
        BackboneConfig(type=backbone_type, remat=remat),
        HeadConfig(out_features=NUM_LABELS),
        TrainingConfig(masking_prob=0.15, bfloat16=bfloat16, fused_ce=fused_ce, grad_accum=grad_accum,
                       moments_dtype=moments_dtype),
        attention_impl=attention_impl,
    )
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, task.training_config, mesh=mesh)
    rng = np.random.RandomState(0)
    batches = [synthetic_masked_batch(rng, batch_size=BATCH_SIZE, width=WIDTH, num_labels=NUM_LABELS) for _ in range(4)]
    return trainer, batches, mesh


def time_variant(name, steps, trials, **kwargs):
    import jax

    from pero_pretraining_tpu.parallel.sharding import shard_batch_leading

    trainer, batches, mesh = build(**kwargs)
    state = trainer.init_state(batches[0])
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *(batches * (steps // 4)))
    sdev = shard_batch_leading(stacked, mesh)

    state, m = trainer._train_many(state, sdev)  # compile + warm
    float(m["loss"])
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        state, m = trainer._train_many(state, sdev)
        float(m["loss"])
        best = max(best, BATCH_SIZE * steps / (time.perf_counter() - t0))
    print(json.dumps({"variant": name, "lines_per_sec": round(best, 1),
                      "ms_per_step": round(1000.0 * BATCH_SIZE / best, 3), **kwargs}), flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=24, help="optimizer steps fused per timed program")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--variants", default="base,flash,remat,fused_ce,fp32,bf16_moments,int8_moments")
    args = p.parse_args()
    wanted = set(args.variants.split(","))

    if "base" in wanted:
        time_variant("base", args.steps, args.trials)
    if "flash" in wanted:
        time_variant("flash-attention", args.steps, args.trials, attention_impl="flash")
    if "remat" in wanted:
        time_variant("remat", args.steps, args.trials, remat=True)
    if "fused_ce" in wanted:
        time_variant("fused-ce", args.steps, args.trials, fused_ce=True)
    if "fp32" in wanted:
        time_variant("fp32", args.steps, args.trials, bfloat16=False)
    if "bf16_moments" in wanted:
        time_variant("bf16-moments", args.steps, args.trials, moments_dtype="bfloat16")
    if "int8_moments" in wanted:
        time_variant("int8-moments", args.steps, args.trials, moments_dtype="int8")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
