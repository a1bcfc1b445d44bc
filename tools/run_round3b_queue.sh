#!/bin/bash
# Round-3 continuation queue (session restart wiped gitignored artifacts:
# image store + checkpoints; .lines/.tsv are committed and the corpus render
# is bit-deterministic given --seed, so stage 0 regenerates the identical
# corpus — verify with `git diff docs/demo/rendered50k/rendered_corpus/`).
# Remaining VERDICT item-1 legs, in leverage order: VICReg and NT-Xent at 50k
# (never run at this scale), second PRETRAINING seed for the headline
# masked_dn leg + 2-seed beam rows, VggT second fine-tune seed.
# One process per stage (axon client accumulates host memory; see
# .claude/skills/verify/SKILL.md). All stages idempotent via on-disk artifacts.
set -e
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"

run () { echo "=== $(date +%H:%M:%S) $*" ; "$@" ; }

# 0. regenerate the deterministic corpus (store is gitignored)
[ -f $OUT/rendered_corpus/images.sqlite ] || run $BASE --stage corpus

# 1. VICReg at 50k (joint objectives need no tokenizer stage)
run $BASE --stage pretrain --objective vicreg
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective vicreg --mode pretrained --budget $b --finetune-seed $s
done; done

# 2. NT-Xent at 50k
run $BASE --stage pretrain --objective ntxent
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective ntxent --mode pretrained --budget $b --finetune-seed $s
done; done

# 3. second PRETRAINING seed for the headline masked_dn leg (targets are
#    deterministic given --seed, so the regenerated tokenizer matches the
#    committed seed-0 rows) + beam rows at BOTH fine-tune seeds
run $BASE --stage targets  --objective masked_dn
run $BASE --stage pretrain --objective masked_dn --pretrain-seed 1
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective masked_dn --mode pretrained --pretrain-seed 1 --budget $b --finetune-seed $s
done; done
for s in 0 1; do for b in 192 48; do
  run $BASE --stage beam --objective masked_dn --pretrain-seed 1 --budget $b --finetune-seed $s
done; done

# 4. VggT second fine-tune seed (pretrain is deterministic given seed, so
#    regenerating the seed-0 checkpoint keeps s1 comparable to committed s0)
run $BASE --stage pretrain --objective masked_dn --backbone vggt
for b in 48 192; do for m in pretrained scratch; do
  run $BASE --stage finetune --objective masked_dn --backbone vggt --mode $m --budget $b --finetune-seed 1
done; done
echo "=== QUEUE DONE $(date +%H:%M:%S)"
