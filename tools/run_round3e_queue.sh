#!/bin/bash
# Round-3 supplemental queue: scratch + beam+LM control rows at 50k.
# The study's beam+LM rows exist only for pretrained legs; a reviewer would
# ask whether beam + char-LM decoding closes the scratch<->pretrained gap.
# The scratch CTC checkpoints were cleaned after their cells landed, so this
# regenerates them (fine-tuning is deterministic given --finetune-seed: the
# re-run cells must reproduce the committed CERs, a free reproducibility
# check) and then beam-decodes each. Skip guards make the queue restartable.
set -e
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
D=$OUT/rendered_corpus
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"

run () { echo "=== $(date +%H:%M:%S) $*" ; "$@" ; }
have () { python - "$1" <<'PY'
import json, sys
try:
    d = json.load(open("docs/demo/rendered50k/rendered_summary.json"))
except FileNotFoundError:
    sys.exit(1)
sys.exit(0 if sys.argv[1] in d else 1)
PY
}

# 192-line cells first: they are the most-cited budget in the tables.
for b in 192 48; do for s in 0 1; do
  [ -f $D/ctc_scratch_${b}_s${s}.msgpack ] || \
    run $BASE --stage finetune --mode scratch --budget $b --finetune-seed $s
  have "scratch_${b}_s${s}_beam_lm" || \
    run $BASE --stage beam --mode scratch --budget $b --finetune-seed $s
done; done

# VggT beam rows wherever a fine-tuned VggT checkpoint is on disk (the
# round-3 VggT seed-1 fine-tunes leave theirs behind): does beam+LM stack
# on the stronger conv-hybrid the way it does on the ViT?
for b in 192 48; do for s in 0 1; do for m in pretrained scratch; do
  key="${m}_vggt_${b}_s${s}"
  [ $m = pretrained ] && key="pretrained_masked_dn_vggt_${b}_s${s}"
  if [ -f $D/ctc_${key}.msgpack ] && ! have "${key}_beam_lm"; then
    run $BASE --stage beam --mode $m --backbone vggt --objective masked_dn --budget $b --finetune-seed $s
  fi
done; done; done
echo "=== QUEUE 3E DONE $(date +%H:%M:%S)"
