"""Analyze a captured flagship device trace into a component breakdown.

Input: the Chrome-trace json.gz produced by tools/profile_flagship.py
(jax.profiler). Every XLA-Ops-lane event carries `hlo_category`, `long_name`
(full HLO with shapes/layouts) and `bytes_accessed` — enough to attribute
device time to model components and to test bandwidth-boundedness op by op
(implied GB/s vs the chip's HBM peak).

    python tools/analyze_trace.py /tmp/flagship_trace --steps 24

Classification (flagship masked-ViT b16 w2048 v4096):
- optimizer:  3-tuple f32 fusions of param shape (fused Adam: p, m, v)
- head/CE:    ops touching [*,4096] logits or the 512x4096 head matmul
- mlp:        512<->2048 matmuls
- attention:  512x512 projections + [16,4,256,*] score/value batched matmuls
- patchify:   conv/reshape from [16,3,40,2048] pixel space, 960->512 matmul
- layernorm/elementwise/other: the rest by hlo_category
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

HBM_GBPS = 819.0  # v5e HBM bandwidth
PEAK_TFLOPS = 197.0  # v5e bf16


def load_ops(trace_dir: str):
    hits = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no trace under {trace_dir}")
    data = json.load(gzip.open(hits[-1], "rt"))
    events = data["traceEvents"]
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = []
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tnames.get((e.get("pid"), e.get("tid")), "")
        if lane != "XLA Ops":
            continue
        args = e.get("args", {})
        ops.append(
            {
                "name": e.get("name", "?"),
                "dur_us": float(e.get("dur", 0.0)),
                "category": args.get("hlo_category", "?"),
                "long_name": args.get("long_name", ""),
                "bytes": int(args.get("bytes_accessed", 0) or 0),
            }
        )
    return ops


def classify(op) -> str:
    name, long_name, cat = op["name"], op["long_name"], op["category"]
    if re.match(r"^(while|tuple|get-tuple-element|copy-start|copy-done|bitcast|copy)", name):
        return "control/copy"
    # fused Adam: tuple of three identically-shaped f32 outputs (p, m, v)
    body = re.sub(r"^%[^=]+= ", "", long_name)
    if re.match(r"^\(f32\[[0-9,]+\]\{[^}]*\}(, f32\[[0-9,]+\]\{[^}]*\}){2}\)", body):
        return "optimizer"
    if "4096" in long_name and ("512,4096" in long_name or "4096,512" in long_name or "256,4096" in long_name):
        return "head+ce"
    if "512,2048" in long_name or "2048,512" in long_name:
        return "mlp"
    if ("16,4,256" in long_name or "64,256,256" in long_name or "512,512" in long_name
            or "512,1536" in long_name or "1536,512" in long_name):
        return "attention"
    if "40,2048" in long_name or "960,512" in long_name or "3,40" in long_name:
        return "patchify/mask"
    if cat in ("convolution fusion", "convolution"):
        return "matmul-other"
    return {"loop fusion": "elementwise", "input fusion": "reduce/norm", "output fusion": "elementwise"}.get(
        cat, "other"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--flops-per-step", type=float, default=565e9,
                   help="train-step FLOPs for MFU (default: flagship estimate)")
    p.add_argument("--report", default=None)
    args = p.parse_args()

    ops = load_ops(args.trace_dir)
    # drop the outermost containers from totals (while/jit wrappers duplicate children)
    leaf = [o for o in ops if not re.match(r"^(while|jit_|0$)", o["name"])]

    by_comp = defaultdict(float)
    by_comp_bytes = defaultdict(int)
    per_op = defaultdict(lambda: [0.0, 0, 0, "", ""])
    for o in leaf:
        comp = classify(o)
        by_comp[comp] += o["dur_us"]
        by_comp_bytes[comp] += o["bytes"]
        row = per_op[o["name"]]
        row[0] += o["dur_us"]
        row[1] += 1
        row[2] += o["bytes"]
        row[3] = comp
        row[4] = o["long_name"][:140]

    step_us = sum(by_comp.values()) / args.steps
    print(f"leaf device time: {step_us:.1f} us/step  ({len(leaf)} events / {args.steps} steps)")
    mfu = args.flops_per_step / (step_us * 1e-6) / (PEAK_TFLOPS * 1e12)
    print(f"MFU at {args.flops_per_step/1e9:.0f} GFLOP/step: {100*mfu:.1f}%\n")

    print(f"{'component':<16} {'us/step':>9} {'%':>6} {'GB/s implied':>13}")
    rows = sorted(by_comp.items(), key=lambda kv: -kv[1])
    for comp, us in rows:
        frac = us / (step_us * args.steps) * 100
        gbps = by_comp_bytes[comp] / 1e9 / (us * 1e-6) if us else 0.0
        print(f"{comp:<16} {us/args.steps:>9.1f} {frac:>6.1f} {gbps:>13.0f}")

    print("\ntop ops:")
    top = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:30]
    for name, (us, n, nbytes, comp, ln) in top:
        gbps = nbytes / 1e9 / (us * 1e-6) if us else 0.0
        print(f"{us/args.steps:>8.1f} us/step x{n:<4d} {comp:<14} {gbps:>5.0f} GB/s  {name:<28} {ln[:95]}")

    if args.report:
        with open(args.report, "w") as f:
            json.dump(
                {
                    "leaf_us_per_step": round(step_us, 1),
                    "mfu_at_flops": {"flops_per_step": args.flops_per_step, "mfu": round(mfu, 4)},
                    "components_us_per_step": {c: round(v / args.steps, 1) for c, v in rows},
                    "components_gbps": {
                        c: round(by_comp_bytes[c] / 1e9 / (v * 1e-6), 1) for c, v in rows if v
                    },
                    "top_ops": [
                        {
                            "name": name,
                            "us_per_step": round(us / args.steps, 1),
                            "count": n,
                            "component": comp,
                            "implied_gbps": round(nbytes / 1e9 / (us * 1e-6), 1) if us else 0,
                            "hlo": ln,
                        }
                        for name, (us, n, nbytes, comp, ln) in top
                    ],
                },
                f,
                indent=2,
            )
        print(f"\nreport -> {args.report}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
