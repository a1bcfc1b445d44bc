#!/bin/bash
# Round-3 TPU queue: VERDICT items 4/8 micro-benches first (timing-sensitive,
# short), then the 50k rendered-study legs (VERDICT item 1): VQ-VAE targets,
# VICReg, NT-Xent at 2 fine-tune seeds; second PRETRAINING seed for the
# headline masked_dn leg (+ beam rows under it); stretch: VggT second seed.
# One process per stage (axon client accumulates host memory; see
# .claude/skills/verify/SKILL.md). All stages idempotent via on-disk artifacts.
set -e
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"

run () { echo "=== $(date +%H:%M:%S) $*" ; "$@" ; }

# (micro-benches tools/bench_overheads.py + tools/bench_int8_labels.py ran
#  separately before this queue — results in docs/bench_{overheads,int8}.json)

# 1. VQ-VAE-targets masked leg (BASELINE.json config 2)
run $BASE --stage targets  --objective vqvae
run $BASE --stage pretrain --objective vqvae
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective vqvae --mode pretrained --budget $b --finetune-seed $s
done; done

# 2. VICReg at 50k
run $BASE --stage pretrain --objective vicreg
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective vicreg --mode pretrained --budget $b --finetune-seed $s
done; done

# 3. NT-Xent at 50k
run $BASE --stage pretrain --objective ntxent
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective ntxent --mode pretrained --budget $b --finetune-seed $s
done; done

# 4. second PRETRAINING seed for the headline masked_dn leg (same corpus +
#    targets as round 2's seed-0 run) + beam rows under it
run $BASE --stage targets  --objective masked_dn
run $BASE --stage pretrain --objective masked_dn --pretrain-seed 1
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective masked_dn --mode pretrained --pretrain-seed 1 --budget $b --finetune-seed $s
done; done
run $BASE --stage beam --objective masked_dn --pretrain-seed 1 --budget 192 --finetune-seed 0
run $BASE --stage beam --objective masked_dn --pretrain-seed 1 --budget 48  --finetune-seed 0

# 5. stretch: VggT second fine-tune seed (pretrain is deterministic given
#    seed, so regenerating the seed-0 checkpoint keeps s1 comparable to the
#    committed s0 rows)
run $BASE --stage pretrain --objective masked_dn --backbone vggt
for b in 48 192; do for m in pretrained scratch; do
  run $BASE --stage finetune --objective masked_dn --backbone vggt --mode $m --budget $b --finetune-seed 1
done; done
echo "=== QUEUE DONE $(date +%H:%M:%S)"
