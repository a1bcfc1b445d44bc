#!/bin/bash
# Round-5 final cell: BOTH axes together for the hybrid — 100k-line corpus x
# 100k iterations (warm-continued from the committed 48k-it data-axis
# state), fine-tuned/evaluated on the unchanged 50k-study protocol. Tests
# the "scale data and optimization together" rule the 2x2 matrix suggests:
# prediction is a new best greedy @192 (<0.0493).
set -u
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered100k
D=$OUT/rendered_corpus
D50=docs/demo/rendered50k/rendered_corpus
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 100000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
B50="python tools/rendered_experiment.py --out docs/demo/rendered50k \
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

[ -f $D/pqae_dn_labels.trn ] || { echo "run run_round5b_corpus100k.sh first"; exit 1; }
PT=$D/pretrained_masked_dn_vggt_it100k.msgpack
SRC48=$D/pretrained_masked_dn_vggt.msgpack
[ -f $SRC48 ] || SRC48=$D50/pretrained_masked_dn_vggt_c100k.msgpack  # committed copy
if [ ! -f $PT ] && [ ! -f $PT.part ]; then
  cp $SRC48 $PT.part
fi
until [ -f $PT ]; do
  run $BASE --stage pretrain --objective masked_dn --backbone vggt \
      --pretrain-tag _it100k --pretrain-iterations 100000 --chunk-iterations 12000 || break
done
[ -f $PT ] || exit 1
cp $PT $D50/pretrained_masked_dn_vggt_c100k_it100k.msgpack
git add -f $D50/pretrained_masked_dn_vggt_c100k_it100k.msgpack && \
  git commit -m "Commit the both-axes VggT pretrain (100k-line corpus x 100k iterations)" || true

# fine-tune/decode @192 first (the headline budget), then @48 time permitting
for b in 192 48; do for s in 0 1; do
  have "pretrained_masked_dn_vggt_c100k_it100k_${b}_s${s}" || \
    run $B50 --stage finetune --objective masked_dn --mode pretrained --backbone vggt \
        --pretrain-tag _c100k_it100k --budget $b --finetune-seed $s
  key="pretrained_masked_dn_vggt_c100k_it100k_${b}_s${s}"
  [ -f $D50/ctc_${key}.msgpack ] && ! have "${key}_beam_lm" && \
    run $B50 --stage beam --objective masked_dn --mode pretrained --backbone vggt \
        --pretrain-tag _c100k_it100k --budget $b --finetune-seed $s
done; done
echo "=== R5E DONE $(date +%H:%M:%S)"
