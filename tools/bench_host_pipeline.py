"""Host data-pipeline throughput distribution (VERDICT r3 item 8).

The pod-provisioning arithmetic in docs/SCALING.md sizes `--loader-procs`
from the single-core host-pipeline rate (store read + native libjpeg decode
+ collate, no device work). Committed observations on this shared 1-core
host range from ~395 to ~1134 lines/s depending on what else the box is
doing, so a single number is dishonest. This tool measures the SAME leg
bench.py times (`measure_real_data_e2e`'s host_rate) K times, tags the run
with the load condition, and appends to docs/bench_host_pipeline.json so
SCALING.md can quote a distribution that covers every committed observation.

Reference analogue: the torch DataLoader worker decode path
(common/dataloader.py:6-19) — the host-side bottleneck both frameworks share.

    python tools/bench_host_pipeline.py --trials 5 --tag unloaded
    python tools/bench_host_pipeline.py --trials 3 --tag "concurrent 50k queue"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # no device work in this leg

DOCS = os.path.join(_HERE, "..", "docs")
OUT = os.path.join(DOCS, "bench_host_pipeline.json")


def measure_once(steps: int, batch_size: int, width: int) -> float:
    import bench  # repo-root bench.py: reuse the exact store + loader recipe

    from pero_pretraining_tpu.data.batching import BatchCreator
    from pero_pretraining_tpu.data.dataset import LinesDataset
    from pero_pretraining_tpu.data.loader import DataLoader
    from pero_pretraining_tpu.training.tester import numeric_batch

    store_path, lines_path = bench._ensure_real_store()
    ds = LinesDataset(store_path, lines_path, max_width=width)
    loader = DataLoader(
        ds, BatchCreator(pad_to=width, seed=0), batch_size=batch_size, shuffle=True, num_workers=4
    )

    def stream():
        while True:
            for b in loader:
                yield numeric_batch(b)

    it = stream()
    for _ in range(3):  # warm the store cache / allocator
        next(it)
    t0 = time.perf_counter()
    for _ in range(steps):
        next(it)
    return batch_size * steps / (time.perf_counter() - t0)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--tag", type=str, required=True,
                   help="load condition, e.g. 'unloaded' or 'concurrent 50k queue'")
    args = p.parse_args()

    rates = []
    for t in range(args.trials):
        r = measure_once(args.steps, args.batch_size, args.width)
        rates.append(round(r, 1))
        print(f"[host-pipeline trial {t + 1}/{args.trials}] {r:.1f} lines/s", flush=True)

    entry = {
        "tag": args.tag,
        "trials": rates,
        "min": min(rates),
        "median": round(float(np.median(rates)), 1),
        "max": max(rates),
        "steps": args.steps,
        "batch_size": args.batch_size,
        "width": args.width,
    }
    history = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            history = json.load(f)["runs"]
    history.append(entry)
    allr = [r for e in history for r in e["trials"]]
    doc = {
        "leg": "store read + native libjpeg decode + collate (no device work), 1 core",
        "runs": history,
        "all_trials_min": min(allr),
        "all_trials_max": max(allr),
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
