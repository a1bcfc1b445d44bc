#!/bin/bash
# Round-3 continuation queue, v2: same legs as run_round3b_queue.sh from the
# VICReg fine-tunes onward, with every 48k-iteration pretrain CHUNKED into
# 12k-step processes (--chunk-iterations; .part checkpoint between chunks).
# Reason: the axon client accumulates ~2.5 MB host RSS per training step, so
# a 48k-step process crawls near ~70 GB RES (observed on the in-flight vicreg
# leg); chunking resets the process per 12k steps with bit-identical data
# order (tools/rendered_experiment.py::run_trainer).
# Waits for the still-running (un-chunked) vicreg pretrain to finish first.
set -e
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
D=$OUT/rendered_corpus
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
CH="--chunk-iterations 12000"

run () { echo "=== $(date +%H:%M:%S) $*" ; "$@" ; }
# re-invoke a chunked pretrain stage until its final checkpoint appears
pretrain_until_done () { local ckpt=$1; shift
  until [ -f "$ckpt" ]; do run $BASE --stage pretrain $CH "$@"; done
}

# 0. wait for the in-flight monolithic vicreg pretrain (PID from before this
#    script; it saves pretrained_vicreg.msgpack on completion)
while [ ! -f $D/pretrained_vicreg.msgpack ]; do sleep 60; done
echo "=== $(date +%H:%M:%S) vicreg pretrain checkpoint present"

# 1. VICReg fine-tunes (10k iterations each — no chunking needed)
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective vicreg --mode pretrained --budget $b --finetune-seed $s
done; done

# 2. NT-Xent at 50k
pretrain_until_done $D/pretrained_ntxent.msgpack --objective ntxent
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective ntxent --mode pretrained --budget $b --finetune-seed $s
done; done

# 3. second PRETRAINING seed for the headline masked_dn leg (targets are
#    deterministic given --seed, so the regenerated tokenizer matches the
#    committed seed-0 rows) + beam rows at BOTH fine-tune seeds
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn
pretrain_until_done $D/pretrained_masked_dn_ps1.msgpack --objective masked_dn --pretrain-seed 1
for s in 0 1; do for b in 48 192; do
  run $BASE --stage finetune --objective masked_dn --mode pretrained --pretrain-seed 1 --budget $b --finetune-seed $s
done; done
for s in 0 1; do for b in 192 48; do
  run $BASE --stage beam --objective masked_dn --pretrain-seed 1 --budget $b --finetune-seed $s
done; done

# 4. VggT second fine-tune seed (pretrain is deterministic given seed, so
#    regenerating the seed-0 checkpoint keeps s1 comparable to committed s0)
pretrain_until_done $D/pretrained_masked_dn_vggt.msgpack --objective masked_dn --backbone vggt
for b in 48 192; do for m in pretrained scratch; do
  run $BASE --stage finetune --objective masked_dn --backbone vggt --mode $m --budget $b --finetune-seed 1
done; done
echo "=== QUEUE DONE $(date +%H:%M:%S)"
