"""A/B-bench the parallelism features at axes=1 against the default path.

Every parallelism feature in this framework (ring attention, stacked-blocks /
pipeline layout, MoE FFN, FSDP, ZeRO-1) is selectable on a 1-axis mesh, where
it must cost (approximately) nothing: a degenerate ring is one attention
block, a 1-way shard is a no-op GSPMD constraint, a 1-expert MoE is a dense
MLP plus a trivial router. This measures each variant's scan-fused train-step
throughput on the real chip vs the default configuration and writes
docs/bench_overheads.json (summarized in docs/SCALING.md "measured
overheads").

Workload = bench.py's flagship config (masked ViT, batch 16, 2048-px lines,
4096-label head, bf16). Timing = scan-fused _train_many (K=8 steps per device
program), best of `--trials`, loss fetched to force completion (same
methodology as bench.py — immune to per-step dispatch jitter on the tunneled
transport).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_HERE = os.path.dirname(os.path.abspath(__file__))
OUT_PATH = os.path.join(_HERE, "..", "docs", "bench_overheads.json")

BATCH_SIZE = 16
WIDTH = 2048
NUM_LABELS = 4096
K = 8  # steps fused per device program


def build_leg(name: str, mesh):
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    bb = dict(type="vit")
    tr = dict(masking_prob=0.15, bfloat16=True)
    attention_impl = "xla"
    if name == "ring_seq1":
        attention_impl = "ring"
    elif name == "stacked_pipe1":
        bb["stacked_blocks"] = True
    elif name == "moe_1expert":
        bb["num_experts"] = 1
    elif name == "fsdp_data1":
        tr["fsdp"] = True
    elif name == "zero1_data1":
        tr["shard_opt_state"] = True
    elif name != "baseline":
        raise ValueError(name)
    task = MaskedTask(
        BackboneConfig(**bb), HeadConfig(out_features=NUM_LABELS), TrainingConfig(**tr),
        attention_impl=attention_impl, mesh=mesh,
    )
    return Trainer(task, task.training_config, mesh=mesh)


def measure_leg(name: str, trials: int) -> float:
    import jax

    from pero_pretraining_tpu.configs import MeshConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.parallel.sharding import shard_batch_leading

    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = build_leg(name, mesh)
    rng = np.random.RandomState(0)
    batches = [
        synthetic_masked_batch(rng, batch_size=BATCH_SIZE, width=WIDTH, num_labels=NUM_LABELS)
        for _ in range(K)
    ]
    state = trainer.init_state(batches[0])
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    sdev = shard_batch_leading(stacked, mesh)

    state, m = trainer._train_many(state, sdev)  # compile + warm D2H
    float(m["loss"])
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(3):
            state, m = trainer._train_many(state, sdev)
        float(m["loss"])
        best = max(best, BATCH_SIZE * 3 * K / (time.perf_counter() - t0))
    return best


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--legs", type=str,
                   default="baseline,ring_seq1,stacked_pipe1,moe_1expert,fsdp_data1,zero1_data1")
    args = p.parse_args()

    # merge with prior results so partial re-runs (e.g. one leg after a fix)
    # keep the rest of the table
    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f).get("lines_per_sec", {})
    for leg in args.legs.split(","):
        rate = measure_leg(leg, args.trials)
        results[leg] = round(rate, 2)
        print(f"{leg}: {rate:.2f} lines/s", flush=True)

    base = results.get("baseline")
    report = {
        "workload": f"masked ViT b{BATCH_SIZE} w{WIDTH} v{NUM_LABELS} bf16, scan-fused K={K}",
        "lines_per_sec": results,
    }
    if base:
        report["overhead_vs_baseline_pct"] = {
            leg: round(100.0 * (base - rate) / base, 2)
            for leg, rate in results.items() if leg != "baseline"
        }
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["lines_per_sec"]))


if __name__ == "__main__":
    main()
