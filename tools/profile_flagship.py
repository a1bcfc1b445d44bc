"""Capture + analyze a device trace of the flagship masked-ViT train step.

Produces the committed breakdown behind docs/PROFILE.md: where the ~6 ms
b16/w2048/bf16 step (reference workload: masked_pretraining/train.py:30-44
defaults) actually goes — attention / MLP / patchify+mask / head+CE /
optimizer / gaps — from a REAL jax.profiler device trace of the scan-fused
step, not estimates.

Usage (quiet host, TPU attached):
    python tools/profile_flagship.py [--steps 24] [--outdir /tmp/flagship_trace]

Outputs: the trace dir (TensorBoard/Perfetto-viewable) and a JSON + text
aggregation of device-op durations grouped by HLO fusion name.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def capture(steps: int, outdir: str, backbone: str = "vit", moments_dtype: str = "float32") -> float:
    import jax

    from step_ablation import build
    from pero_pretraining_tpu.parallel.sharding import shard_batch_leading

    trainer, batches, mesh = build(backbone_type=backbone, moments_dtype=moments_dtype)
    state = trainer.init_state(batches[0])
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *(batches * (steps // 4)))
    sdev = shard_batch_leading(stacked, mesh)

    state, m = trainer._train_many(state, sdev)  # compile + warm
    float(m["loss"])
    t0 = time.perf_counter()
    state, m = trainer._train_many(state, sdev)
    float(m["loss"])
    wall_ms = 1000.0 * (time.perf_counter() - t0) / steps

    jax.profiler.start_trace(outdir)
    state, m = trainer._train_many(state, sdev)
    float(m["loss"])
    jax.profiler.stop_trace()
    return wall_ms


def find_trace_file(outdir: str):
    hits = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True))
    return hits[-1] if hits else None


def analyze(trace_path: str, steps: int, top: int = 40):
    """Aggregate device-lane complete events by name. Chrome-trace format:
    pid/tid lanes; device lanes carry XLA op events with `dur` in us."""
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # identify device lanes by process name metadata
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, name in proc_names.items() if "TPU" in name or "/device" in name.lower()}

    totals = defaultdict(float)
    counts = defaultdict(int)
    lane_busy = defaultdict(float)
    lane_span = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        totals[name] += dur
        counts[name] += 1
        key = (pid, e.get("tid"))
        lane_busy[key] += dur
        ts = float(e.get("ts", 0.0))
        lo, hi = lane_span.get(key, (ts, ts + dur))
        lane_span[key] = (min(lo, ts), max(hi, ts + dur))

    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    out = {
        "per_op_us_total": {k: round(v, 1) for k, v in rows},
        "per_op_count": {k: counts[k] for k, _ in rows},
        "per_op_us_per_step": {k: round(v / steps, 2) for k, v in rows},
        "process_names": {str(k): v for k, v in proc_names.items()},
        "lanes": {
            f"{proc_names.get(pid, pid)}/tid{tid}": {
                "busy_ms": round(busy / 1000.0, 3),
                "span_ms": round((lane_span[(pid, tid)][1] - lane_span[(pid, tid)][0]) / 1000.0, 3),
            }
            for (pid, tid), busy in sorted(lane_busy.items(), key=lambda kv: -kv[1])[:12]
        },
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--outdir", default="/tmp/flagship_trace")
    p.add_argument("--report", default="docs/flagship_trace_ops.json")
    p.add_argument("--backbone", default="vit", choices=("vit", "vggt"),
                   help="vggt traces the VGG-conv-frontend hybrid (same b16 w2048 workload)")
    p.add_argument("--moments-dtype", default="float32", choices=("float32", "bfloat16", "int8"),
                   help="Adam moment storage for the traced step (bfloat16 = the shipped "
                        "framework default since round 4; float32 matches the original "
                        "committed breakdown in docs/PROFILE.md)")
    args = p.parse_args()

    wall_ms = capture(args.steps, args.outdir, backbone=args.backbone,
                      moments_dtype=args.moments_dtype)
    print(f"wall: {wall_ms:.3f} ms/step (scan-fused K={args.steps})")
    trace_path = find_trace_file(args.outdir)
    if trace_path is None:
        print(f"no trace.json.gz under {args.outdir}; files: ")
        for f in glob.glob(os.path.join(args.outdir, '**', '*'), recursive=True):
            print("  ", f)
        return 1
    print(f"trace: {trace_path}")
    report = analyze(trace_path, args.steps)
    report["wall_ms_per_step"] = round(wall_ms, 3)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"lanes": report["lanes"]}, indent=2))
    for name, us in list(report["per_op_us_per_step"].items())[:25]:
        print(f"{us:10.1f} us/step  x{report['per_op_count'][name]:4d}  {name[:90]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
