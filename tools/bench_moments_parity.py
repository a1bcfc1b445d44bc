"""Qualify bf16 Adam moments for default-on (VERDICT r3 item 6).

`--moments-dtype bfloat16` is a measured +5.3% on the flagship step (halved
moment HBM traffic; docs/ROADMAP.md) but ships opt-in pending numerics
evidence. This tool runs the evidence: the SAME masked-pretraining run
(study-scale backbone, identical seeds and batch stream) twice — fp32
moments vs bf16 moments — for N steps, and reports the loss-curve divergence
and final parameter drift. Writes docs/bench_moments_parity.json.

Reference analogue: the reference's plain fp32 torch.optim.Adam
(masked_pretraining/train.py:146) — bf16 moments are a TPU-native
memory-bandwidth optimization with no reference counterpart.

    python tools/bench_moments_parity.py [--steps 300] [--flagship]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DOCS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs")


def run_curve(moments_dtype: str, steps: int, flagship: bool, view: int):
    import jax

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    if flagship:
        bb = BackboneConfig(type="vit")  # flagship defaults (512d x 6)
        width, labels, bs = 2048, 4096, 16
    else:
        bb = BackboneConfig(type="vit", model_dim=256, num_heads=4, num_blocks=4,
                            feedforward_dim=1024, max_len=128)
        width, labels, bs = 512, 128, 16
    training = TrainingConfig(learning_rate=3e-4, warmup_iterations=50, batch_size=bs,
                              masking_prob=0.3, seed=0, unmasked_weight=0.1,
                              moments_dtype=moments_dtype)
    task = MaskedTask(bb, HeadConfig(in_features=bb.model_dim, out_features=labels), training)
    mesh = create_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = Trainer(task, training, mesh=mesh)

    # fixed synthetic batch stream: both runs consume byte-identical batches
    rng = np.random.RandomState(0)
    batches = [synthetic_masked_batch(rng, batch_size=bs, width=width, num_labels=labels)
               for _ in range(8)]
    state = trainer.init_state(batches[0])
    losses = {}
    t0 = time.time()
    for it in range(steps):
        state, metrics = trainer.train_step(state, batches[it % len(batches)])
        if it % view == 0 or it == steps - 1:
            losses[it] = float(metrics["loss"])
    elapsed = time.time() - t0
    params = jax.device_get(state.params)
    return losses, params, elapsed


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--flagship", action="store_true",
                        help="flagship shapes (512d ViT, w2048, 4096 labels) instead of study scale")
    parser.add_argument("--view", type=int, default=10)
    args = parser.parse_args()

    import jax

    results = {}
    for dtype in ("float32", "bfloat16"):
        print(f"[{dtype} moments] {args.steps} steps...", flush=True)
        losses, params, elapsed = run_curve(dtype, args.steps, args.flagship, args.view)
        results[dtype] = {"losses": losses, "params": params, "seconds": elapsed}
        print(f"[{dtype} moments] final loss {list(losses.values())[-1]:.6f} in {elapsed:.1f}s",
              flush=True)

    f32, bf16 = results["float32"], results["bfloat16"]
    its = sorted(f32["losses"])
    curve_gap = {str(i): round(abs(f32["losses"][i] - bf16["losses"][i]), 6) for i in its}
    final_gap = abs(list(f32["losses"].values())[-1] - list(bf16["losses"].values())[-1])
    rel_final = final_gap / max(abs(list(f32["losses"].values())[-1]), 1e-9)

    # parameter drift: relative L2 over the whole tree
    num, den = 0.0, 0.0
    for a, b in zip(jax.tree_util.tree_leaves(f32["params"]), jax.tree_util.tree_leaves(bf16["params"])):
        num += float(np.sum((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
        den += float(np.sum(np.asarray(a, np.float64) ** 2))
    param_rel_l2 = (num / max(den, 1e-18)) ** 0.5

    out = {
        "workload": ("flagship ViT b16 w2048 v4096" if args.flagship
                     else "study-scale ViT b16 w512 v128") + f", {args.steps} steps, identical batches",
        "loss_fp32_final": round(list(f32["losses"].values())[-1], 6),
        "loss_bf16_final": round(list(bf16["losses"].values())[-1], 6),
        "final_loss_abs_gap": round(final_gap, 6),
        "final_loss_rel_gap": round(rel_final, 6),
        "param_relative_l2_drift": round(param_rel_l2, 6),
        "loss_gap_by_iteration": curve_gap,
        "seconds": {"float32": round(f32["seconds"], 1), "bfloat16": round(bf16["seconds"], 1)},
    }
    os.makedirs(DOCS, exist_ok=True)
    with open(os.path.join(DOCS, "bench_moments_parity.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "loss_gap_by_iteration"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
