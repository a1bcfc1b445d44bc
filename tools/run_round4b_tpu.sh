#!/bin/bash
# Round-4 follow-up TPU measurements, serialized after the round-4 queue
# (the chip and the single host core must not be shared between jobs):
#   1. bf16-moments numerics qualification at flagship shapes (VERDICT item 6)
#   2. re-measure the 1-expert MoE + stacked_pipe1 overheads after the
#      dense-dispatch fix (VERDICT item 5)
#   3. serving-path legs incl. beam+LM decode throughput (VERDICT item 7)
#   4. a fresh full bench.py (validates the driver-proofing live)
#   5. unloaded host-pipeline trials (VERDICT item 8; CPU-only, idle core)
# Usage: bash tools/run_round4b_tpu.sh [queue_pid]
set -u
cd "$(dirname "$0")/.."
QPID=${1:-}
if [ -n "$QPID" ]; then
  echo "waiting for queue pid $QPID to exit..."
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
  echo "queue exited at $(date +%H:%M:%S)"
fi
run () { echo "=== $(date +%H:%M:%S) $*" ; "$@" ; echo "--- rc=$?" ; }

run timeout 1200 python tools/bench_moments_parity.py --flagship --steps 1000 --view 50
run timeout 1800 python tools/bench_overheads.py --legs baseline,moe_1expert,stacked_pipe1
run timeout 1800 python tools/bench_all.py --only transcribe
run timeout 900 python bench.py
run timeout 1800 python tools/bench_host_pipeline.py --trials 5 --tag unloaded
echo "=== R4B DONE $(date +%H:%M:%S)"
