#!/bin/bash
# Round-3 queue F: fill every remaining 50k-study cell after the machine
# reset wiped the uncommitted heavyweight artifacts (corpus sqlite, msgpack
# checkpoints). All stages are deterministic given their seeds, so the
# regenerated artifacts must reproduce the committed summary cells exactly —
# every re-run fine-tune doubles as a free cross-machine reproducibility
# check (the summary cell is overwritten; `git diff` shows any drift).
#
# Cells this queue adds (none exist in rendered_summary.json yet):
#   scratch_{48,192}_s{0,1}_beam_lm            — beam+LM control on scratch
#   pretrained_masked_dn_{48,192}_s1_beam_lm   — s1 beam rows for the headline leg
#   {pretrained_masked_dn,scratch}_vggt_{48,192}_s1 (+ _beam_lm)
#                                              — VggT second fine-tune seed
# Skip guards: summary key for finetune/beam cells, artifact file for
# corpus/targets/pretrain — restartable after any interruption.
set -e
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
D=$OUT/rendered_corpus
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
CH="--chunk-iterations 12000"

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
pretrain_until_done () { local ckpt=$1; shift
  until [ -f "$ckpt" ]; do run $BASE --stage pretrain $CH "$@"; done
}

# A. Corpus (seeded; regenerated images.sqlite is bit-identical to the one
#    the committed cells were produced from).
[ -f $D/images.sqlite ] || run $BASE --stage corpus

# B. Scratch cells: re-run fine-tunes (reproducibility check vs committed
#    CERs) to recreate checkpoints, then the missing beam+LM control rows.
for b in 192 48; do for s in 0 1; do
  [ -f $D/ctc_scratch_${b}_s${s}.msgpack ] || \
    run $BASE --stage finetune --mode scratch --budget $b --finetune-seed $s
  have "scratch_${b}_s${s}_beam_lm" || \
    run $BASE --stage beam --mode scratch --budget $b --finetune-seed $s
done; done

# C. Headline masked_dn leg: regenerate targets + 48k pretrain (chunked),
#    re-run the s1 fine-tunes (reproducibility check), add s1 beam rows.
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn
pretrain_until_done $D/pretrained_masked_dn.msgpack --objective masked_dn
for b in 192 48; do
  [ -f $D/ctc_pretrained_masked_dn_${b}_s1.msgpack ] || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --budget $b --finetune-seed 1
  have "pretrained_masked_dn_${b}_s1_beam_lm" || \
    run $BASE --stage beam --objective masked_dn --mode pretrained --budget $b --finetune-seed 1
done

# D. VggT second fine-tune seed: regenerate the 48k VggT pretrain, run the
#    four missing s1 cells, then beam rows for every VggT checkpoint on disk.
pretrain_until_done $D/pretrained_masked_dn_vggt.msgpack --objective masked_dn --backbone vggt
for b in 192 48; do
  have "pretrained_masked_dn_vggt_${b}_s1" || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --backbone vggt --budget $b --finetune-seed 1
  have "scratch_vggt_${b}_s1" || \
    run $BASE --stage finetune --mode scratch --backbone vggt --budget $b --finetune-seed 1
done
for b in 192 48; do for s in 0 1; do
  if [ -f $D/ctc_pretrained_masked_dn_vggt_${b}_s${s}.msgpack ] && ! have "pretrained_masked_dn_vggt_${b}_s${s}_beam_lm"; then
    run $BASE --stage beam --objective masked_dn --mode pretrained --backbone vggt --budget $b --finetune-seed $s
  fi
  if [ -f $D/ctc_scratch_vggt_${b}_s${s}.msgpack ] && ! have "scratch_vggt_${b}_s${s}_beam_lm"; then
    run $BASE --stage beam --mode scratch --backbone vggt --budget $b --finetune-seed $s
  fi
done; done
echo "=== QUEUE 3F DONE $(date +%H:%M:%S)"
