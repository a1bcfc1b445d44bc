#!/bin/bash
# Round-4 queue: close VERDICT r3 items 2-4 on the 50k study.
#   B. pqae_dn labels via the committed tokenizer (skip guard makes this the
#      ~15-min assign pass only).
#   C. Regenerate the 48k VggT pretrain (chunked), COMMIT it (item 3), then
#      fine-tune BOTH seeds from it (the pre-recycle s0 checkpoints are gone;
#      refreshing s0 keeps the +/- pair consistent around one pretrain) and
#      add the scratch_vggt s1 cells.
#   D. Regenerate the 48k ViT masked_dn pretrain, COMMIT it, re-run the s1
#      fine-tunes, and add the missing headline s1 beam rows (item 4).
#   E. (time permitting) beam rows for every VggT checkpoint on disk.
# Safe to re-launch anytime: every step is guarded by its artifact.
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
commit_ckpt () { # durability: expensive 48k pretrains survive a VM recycle
  git add -f "$1" && git commit -m "$2" || true
}

# A. Corpus image store (wiped by VM recycles; re-renders bit-identically
#    from the committed text + seed).
[ -f $D/images.sqlite ] || run $BASE --stage corpus

# B. Targets shared by the ViT and VggT masked_dn pretrains.
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn

# C. VggT: pretrain -> commit -> 2-seed fine-tunes (+ scratch_vggt s1).
pretrain_until_done $D/pretrained_masked_dn_vggt.msgpack --objective masked_dn --backbone vggt
commit_ckpt $D/pretrained_masked_dn_vggt.msgpack \
  "Commit the regenerated 48k VggT masked_dn pretrain for durability"
for b in 192 48; do for s in 0 1; do
  [ -f $D/ctc_pretrained_masked_dn_vggt_${b}_s${s}.msgpack ] || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --backbone vggt --budget $b --finetune-seed $s
done; done
for b in 192 48; do
  have "scratch_vggt_${b}_s1" || \
    run $BASE --stage finetune --mode scratch --backbone vggt --budget $b --finetune-seed 1
done

# D. Headline masked_dn leg: regenerate the ViT 48k pretrain -> commit ->
#    s1 fine-tunes -> the missing s1 beam rows.
pretrain_until_done $D/pretrained_masked_dn.msgpack --objective masked_dn
commit_ckpt $D/pretrained_masked_dn.msgpack \
  "Commit the regenerated 48k ViT masked_dn pretrain for durability"
for b in 192 48; do
  [ -f $D/ctc_pretrained_masked_dn_${b}_s1.msgpack ] || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --budget $b --finetune-seed 1
  have "pretrained_masked_dn_${b}_s1_beam_lm" || \
    run $BASE --stage beam --objective masked_dn --mode pretrained --budget $b --finetune-seed 1
done

# E. Time permitting: beam rows for every VggT checkpoint on disk.
for b in 192 48; do for s in 0 1; do
  if [ -f $D/ctc_pretrained_masked_dn_vggt_${b}_s${s}.msgpack ] && ! have "pretrained_masked_dn_vggt_${b}_s${s}_beam_lm"; then
    run $BASE --stage beam --objective masked_dn --mode pretrained --backbone vggt --budget $b --finetune-seed $s
  fi
  if [ -f $D/ctc_scratch_vggt_${b}_s${s}.msgpack ] && ! have "scratch_vggt_${b}_s${s}_beam_lm"; then
    run $BASE --stage beam --mode scratch --backbone vggt --budget $b --finetune-seed $s
  fi
done; done
echo "=== QUEUE R4 DONE $(date +%H:%M:%S)"
