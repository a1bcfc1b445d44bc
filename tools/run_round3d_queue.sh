#!/bin/bash
# Round-3 continuation queue, v3: identical legs to run_round3c_queue.sh but
# every stage carries an explicit skip guard (summary key for finetune/beam,
# checkpoint file for pretrains, labels file for targets) so the queue can be
# re-launched after a session restart without re-running completed cells.
# State at authoring time: vicreg pretrain + 3/4 vicreg fine-tunes committed;
# everything after that outstanding. Pretrains chunked into 12k-step
# processes (axon client accumulates ~2.5 MB host RSS per step).
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

[ -f $D/images.sqlite ] || run $BASE --stage corpus

# 1. VICReg fine-tunes (10k iterations each — no chunking needed)
[ -f $D/pretrained_vicreg.msgpack ] || pretrain_until_done $D/pretrained_vicreg.msgpack --objective vicreg
for s in 0 1; do for b in 48 192; do
  have "pretrained_vicreg_${b}_s${s}" || \
    run $BASE --stage finetune --objective vicreg --mode pretrained --budget $b --finetune-seed $s
done; done

# 2. NT-Xent at 50k
pretrain_until_done $D/pretrained_ntxent.msgpack --objective ntxent
for s in 0 1; do for b in 48 192; do
  have "pretrained_ntxent_${b}_s${s}" || \
    run $BASE --stage finetune --objective ntxent --mode pretrained --budget $b --finetune-seed $s
done; done

# 3. second PRETRAINING seed for the headline masked_dn leg (targets are
#    deterministic given --seed, so the regenerated tokenizer matches the
#    committed seed-0 rows) + beam rows at BOTH fine-tune seeds
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn
pretrain_until_done $D/pretrained_masked_dn_ps1.msgpack --objective masked_dn --pretrain-seed 1
for s in 0 1; do for b in 48 192; do
  have "pretrained_masked_dn_ps1_${b}_s${s}" || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --pretrain-seed 1 --budget $b --finetune-seed $s
done; done
for s in 0 1; do for b in 192 48; do
  have "pretrained_masked_dn_ps1_${b}_s${s}_beam_lm" || \
    run $BASE --stage beam --objective masked_dn --pretrain-seed 1 --budget $b --finetune-seed $s
done; done

# 4. VggT second fine-tune seed (pretrain is deterministic given seed, so
#    regenerating the seed-0 checkpoint keeps s1 comparable to committed s0)
pretrain_until_done $D/pretrained_masked_dn_vggt.msgpack --objective masked_dn --backbone vggt
for b in 48 192; do for m in pretrained scratch; do
  key="${m}_vggt_${b}_s1"; [ $m = pretrained ] && key="pretrained_masked_dn_vggt_${b}_s1"
  have "$key" || \
    run $BASE --stage finetune --objective masked_dn --backbone vggt --mode $m --budget $b --finetune-seed 1
done; done
echo "=== QUEUE DONE $(date +%H:%M:%S)"
