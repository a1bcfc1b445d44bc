#!/bin/bash
# Round-5 queue: close VERDICT r4 items 2, 3, 6, 7 on the real chip.
#   0. a full live bench.py (validates the new build-leg retry hardening and
#      regenerates BENCH_DETAILS.json after the r4 failed run clobbered it).
#   A. corpus image store (wiped by VM recycles; re-renders bit-identically
#      from the committed text + seed).
#   B. targets (skip-guarded; pqae_dn labels are committed).
#   C. item 3: the last single-seed decode cells — re-fine-tune scratch-VggT
#      at seed 0 (the pre-recycle ctc checkpoints are gone; same seed ->
#      bit-identical run, the greedy CER must reproduce the committed
#      scratch_vggt_{b}_s0 cells) and add the s0 beam+LM rows.
#   D. item 7: qualify the framework's bf16-moments DEFAULT at study scale —
#      the flagship VggT @192 fine-tune pair under --moments-dtype bfloat16,
#      to compare against the committed fp32 cells.
#   E. item 6: one rung toward the paper's regime — the 100k-iteration
#      (reference masked_pretraining/train.py:36 default) ViT masked_dn
#      pretrain, warm-started from the committed 48k full train state
#      (identical data order/schedule to a monolithic 100k run), then
#      2-seed fine-tunes at both budgets.
#   F. time permitting: the same 100k rung for the VggT backbone.
# Safe to re-launch anytime: every step is guarded by its artifact.
set -u
cd "$(dirname "$0")/.."
OUT=docs/demo/rendered50k
D=$OUT/rendered_corpus
BASE="python tools/rendered_experiment.py --out $OUT \
  --n-unlabeled 50000 --n-test 1000 --ae-iterations 4000 --pretrain-iterations 48000"
CH="--chunk-iterations 12000"

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
commit_ckpt () { # durability: expensive pretrains must survive a VM recycle
  git add -f "$1" && git commit -m "$2" || true
}

# 0. Live bench (also the BENCH_DETAILS regeneration the r4 advisor asked
#    for). Guarded: skip once a full capture (device_resident key) exists so
#    a queue relaunch does not overwrite a good capture with a noisier one.
grep -q device_resident_lines_per_sec BENCH_DETAILS.json 2>/dev/null || \
  run timeout 1100 python bench.py

# A/B. Corpus store + targets.
[ -f $D/images.sqlite ] || run $BASE --stage corpus
[ -f $D/pqae_dn_labels.trn ] || run $BASE --stage targets --objective masked_dn

# C. scratch-VggT seed-0 beam rows (VERDICT item 3).
for b in 192 48; do
  [ -f $D/ctc_scratch_vggt_${b}_s0.msgpack ] || \
    run $BASE --stage finetune --mode scratch --backbone vggt --budget $b --finetune-seed 0
  have "scratch_vggt_${b}_s0_beam_lm" || \
    run $BASE --stage beam --mode scratch --backbone vggt --budget $b --finetune-seed 0
done

# D. bf16-moments qualification pair at study scale (VERDICT item 7).
for s in 0 1; do
  have "pretrained_masked_dn_vggt_192_bf16m_s${s}" || \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --backbone vggt \
        --budget 192 --finetune-seed $s --moments-dtype bfloat16
done

# D2. Fresh flagship trace under the SHIPPED defaults (bf16 moments) —
#     VERDICT item 5; the committed 4.32 ms breakdown predates the flip.
[ -f docs/flagship_trace_ops_bf16m.json ] || \
  run timeout 1200 python tools/profile_flagship.py --moments-dtype bfloat16 \
      --report docs/flagship_trace_ops_bf16m.json --outdir /tmp/flagship_trace_bf16m

# E. 100k-iteration ViT pretrain (paper budget), warm-started from the
#    committed 48k full train state; then 2-seed fine-tunes at both budgets.
PT100=$D/pretrained_masked_dn_it100k.msgpack
if [ ! -f $PT100 ] && [ ! -f $PT100.part ]; then
  cp $D/pretrained_masked_dn.msgpack $PT100.part
fi
until [ -f $PT100 ]; do
  run $BASE --stage pretrain --objective masked_dn --pretrain-tag _it100k \
      --pretrain-iterations 100000 $CH || break
done
[ -f $PT100 ] && commit_ckpt $PT100 \
  "Commit the 100k-iteration ViT masked_dn pretrain (paper iteration budget)"
for b in 192 48; do for s in 0 1; do
  [ -f $PT100 ] && ! have "pretrained_masked_dn_it100k_${b}_s${s}" && \
    run $BASE --stage finetune --objective masked_dn --mode pretrained \
        --pretrain-tag _it100k --budget $b --finetune-seed $s
done; done

# F. Time permitting: the VggT 100k rung.
PT100V=$D/pretrained_masked_dn_vggt_it100k.msgpack
if [ ! -f $PT100V ] && [ ! -f $PT100V.part ]; then
  cp $D/pretrained_masked_dn_vggt.msgpack $PT100V.part
fi
until [ -f $PT100V ]; do
  run $BASE --stage pretrain --objective masked_dn --backbone vggt --pretrain-tag _it100k \
      --pretrain-iterations 100000 $CH || break
done
[ -f $PT100V ] && commit_ckpt $PT100V \
  "Commit the 100k-iteration VggT masked_dn pretrain (paper iteration budget)"
for b in 192 48; do for s in 0 1; do
  [ -f $PT100V ] && ! have "pretrained_masked_dn_vggt_it100k_${b}_s${s}" && \
    run $BASE --stage finetune --objective masked_dn --mode pretrained --backbone vggt \
        --pretrain-tag _it100k --budget $b --finetune-seed $s
done; done
echo "=== QUEUE R5 DONE $(date +%H:%M:%S)"
