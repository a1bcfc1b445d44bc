#!/bin/bash
# Round-3 queue G: remaining 50k cells, reordered so the VggT second
# fine-tune seed (the explicitly-requested VERDICT item) lands before the
# headline-leg s1 beam rows (marginal: 2x2-seed beam evidence already exists
# via the ps1 leg). Same skip guards as queue F; safe to re-launch anytime.
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

# A. Finish any scratch cells queue F didn't get to.
for b in 192 48; do for s in 0 1; do
  [ -f $D/ctc_scratch_${b}_s${s}.msgpack ] || \
    run $BASE --stage finetune --mode scratch --budget $b --finetune-seed $s
  have "scratch_${b}_s${s}_beam_lm" || \
    run $BASE --stage beam --mode scratch --budget $b --finetune-seed $s
done; done

# B. Targets are shared by the ViT and VggT masked_dn pretrains.
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn

# C. VggT second fine-tune seed (+ scratch_vggt s1) and beam rows for every
#    VggT checkpoint on disk.
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

# D. Headline masked_dn leg: regenerate the ViT 48k pretrain, re-run the s1
#    fine-tunes, add the missing s1 beam rows.
pretrain_until_done $D/pretrained_masked_dn.msgpack --objective masked_dn
for b in 192 48; do
  [ -f $D/ctc_pretrained_masked_dn_${b}_s1.msgpack ] || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --budget $b --finetune-seed 1
  have "pretrained_masked_dn_${b}_s1_beam_lm" || \
    run $BASE --stage beam --objective masked_dn --mode pretrained --budget $b --finetune-seed 1
done
echo "=== QUEUE 3G DONE $(date +%H:%M:%S)"
