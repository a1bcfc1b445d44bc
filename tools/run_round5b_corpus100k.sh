#!/bin/bash
# Round-5 tail: the DATA axis of VERDICT item 6 — a 100k-line corpus at the
# standard 48k-iteration budget (the iteration axis measured flat: it100k
# rows in rendered_summary.json), flagship objective (masked dn-PQ-AE, ViT).
#
# Protocol (keeps everything else constant for comparability):
#   1. render a 100k-line corpus into docs/demo/rendered100k (separate dir —
#      the committed 50k corpus artifacts stay untouched),
#   2. reuse the COMMITTED 50k denoising tokenizer + k-means centers (copied
#      in; the skip guard then runs only the label-assign pass) so target
#      quality is held constant and only unlabeled-data volume varies,
#   3. pretrain 48k iterations on the 100k-line labels,
#   4. copy the checkpoint into the 50k study dir as
#      pretrained_masked_dn_c100k.msgpack and fine-tune/evaluate on the SAME
#      budget tsvs and test set as every other study row (tag _c100k).
# Usage: bash tools/run_round5b_corpus100k.sh [queue_pid]
set -u
cd "$(dirname "$0")/.."
QPID=${1:-}
if [ -n "$QPID" ]; then
  echo "waiting for queue pid $QPID to exit..."
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
  echo "queue exited at $(date +%H:%M:%S)"
fi
OUT=docs/demo/rendered100k
D=$OUT/rendered_corpus
D50=docs/demo/rendered50k/rendered_corpus
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 100000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
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

# 1. corpus (seeded; ~5 min)
[ -f $D/images.sqlite ] || run $BASE --stage corpus

# 2. committed tokenizer + centers -> only the assign pass runs
mkdir -p $D
[ -f $D/ae_dn.msgpack ] || cp $D50/ae_dn.msgpack $D/
[ -f $D/pqae_dn_centers.npy ] || cp $D50/pqae_dn_centers.npy $D/
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn

# 3. 48k-iteration pretrain on the 100k-line corpus
PT=$D/pretrained_masked_dn.msgpack
until [ -f $PT ]; do
  run $BASE --stage pretrain --objective masked_dn --chunk-iterations 12000 || break
done
[ -f $PT ] || exit 1
cp $PT $D50/pretrained_masked_dn_c100k.msgpack
git add -f $D50/pretrained_masked_dn_c100k.msgpack && \
  git commit -m "Commit the 100k-line-corpus 48k-iteration ViT masked_dn pretrain" || true

# 4. fine-tune on the 50k study's budgets/test set (everything shared)
B50="python tools/rendered_experiment.py --out docs/demo/rendered50k \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
for b in 192 48; do for s in 0 1; do
  have "pretrained_masked_dn_c100k_${b}_s${s}" || \
    run $B50 --stage finetune --objective masked_dn --mode pretrained \
        --pretrain-tag _c100k --budget $b --finetune-seed $s
done; done
echo "=== R5B DONE $(date +%H:%M:%S)"
