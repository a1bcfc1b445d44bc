#!/bin/bash
# 50k-line rendered transfer study (VERDICT round-1 item 5): out of the toy
# regime — 50,000 unlabeled lines, 1,000 test lines, budgets sized so scratch
# CER at the largest budget drops well below 20%, 2 fine-tune seeds per leg.
# One process per stage/leg (axon client accumulates host memory; see
# .claude/skills/verify/SKILL.md). Stages are idempotent via on-disk artifacts.
set -e
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
BASE="python tools/rendered_experiment.py --out $OUT --objective masked_dn \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"

leg () { # mode budget iters seed
  $BASE --stage finetune --mode "$1" --budget "$2" --finetune-iterations "$3" --finetune-seed "$4"
}

case "${1:-all}" in
  calibrate)  leg scratch 4000 20000 0 ;;
  targets)    $BASE --stage targets ;;
  pretrain)   $BASE --stage pretrain ;;
  legs)
    # seed 0 remaining legs, then seed 1 (calibrate already did scratch/4000/s0)
    leg pretrained 4000 20000 0
    leg scratch     192 10000 0
    leg pretrained  192 10000 0
    leg scratch    1000 15000 0
    leg pretrained 1000 15000 0
    for s in 1; do
      leg scratch    4000 20000 $s
      leg pretrained 4000 20000 $s
      leg scratch     192 10000 $s
      leg pretrained  192 10000 $s
      leg scratch    1000 15000 $s
      leg pretrained 1000 15000 $s
    done
    ;;
  beam)
    $BASE --stage beam --budget 192  --finetune-iterations 10000 --finetune-seed "$2"
    ;;
  all)
    "$0" calibrate
    "$0" targets
    "$0" pretrain
    "$0" legs
    ;;
esac
