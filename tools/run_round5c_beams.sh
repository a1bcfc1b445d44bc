#!/bin/bash
# Round-5 final decode tail: beam + char-LM rows for the round's new cells —
# the VggT it100k fine-tunes (the study's new best greedy cells at both
# budgets) and, when present, the c100k (data-axis) fine-tunes.
# Usage: bash tools/run_round5c_beams.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
QPID=${1:-}
if [ -n "$QPID" ]; then
  echo "waiting for pid $QPID to exit..."
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
  echo "predecessor exited at $(date +%H:%M:%S)"
fi
D=docs/demo/rendered50k/rendered_corpus
B="python tools/rendered_experiment.py --out docs/demo/rendered50k \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
run () { echo "=== $(date +%H:%M:%S) $*" ; "$@" ; local rc=$? ; echo "--- rc=$rc" ; return $rc ; }
have () { python - "$1" <<'PY'
import json, sys
try:
    d = json.load(open("docs/demo/rendered50k/rendered_summary.json"))
except FileNotFoundError:
    sys.exit(1)
sys.exit(0 if sys.argv[1] in d else 1)
PY
}

for tag in _it100k _c100k; do
  for bb in vggt ""; do
    bbflag=""; bbkey=""
    [ "$bb" = vggt ] && { bbflag="--backbone vggt"; bbkey="_vggt"; }
    for b in 192 48; do for s in 0 1; do
      key="pretrained_masked_dn${bbkey}${tag}_${b}_s${s}"
      ckpt=$D/ctc_${key}.msgpack
      if [ -f "$ckpt" ] && ! have "${key}_beam_lm"; then
        run $B --stage beam --objective masked_dn --mode pretrained $bbflag \
            --pretrain-tag $tag --budget $b --finetune-seed $s
      fi
    done; done
  done
done
echo "=== R5C DONE $(date +%H:%M:%S)"
