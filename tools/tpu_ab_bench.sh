#!/bin/bash
# TPU kernel A/B session (VERDICT r2 task 2): run the FULL bench under each
# kernel variant the moment the tunnel is back. In-program numbers only —
# standalone microbenches mislead on this platform (PERFORMANCE.md).
#
#   bash tools/tpu_ab_bench.sh [iters]
#
# Writes one JSON line per variant to /tmp/ab_bench_results.jsonl, then
# profiles the prod1024 train step (criterion share after the round-3
# MaskDINO linear-head pointwise evaluation).
set -u
cd "$(dirname "$0")/.."
ITERS="${1:-10}"
OUT=/tmp/ab_bench_results.jsonl
: > "$OUT"

run() {
  local name="$1"; shift
  echo "== $name ($(date +%H:%M:%S))"
  local line
  line=$(env "$@" BENCH_ITERS="$ITERS" timeout 3000 python bench.py 2>/tmp/ab_bench_last.err | tail -1)
  echo "{\"variant\": \"$name\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

# default (flat_bf16 MSDA + flash ViT — the measured 4.29 img/s path) first:
# it warms the shared weights init.
run baseline_flat_flash
run msda_flat4_bf16  HIPIE_MSDA_METHOD=flat4_bf16
run msda_flat2_bf16  HIPIE_MSDA_METHOD=flat2_bf16
run vit_flash_v2     HIPIE_VIT_FLASH=v2
run vit_xla          HIPIE_VIT_ATTN=xla

echo "== prod1024 train-step profile ($(date +%H:%M:%S))"
timeout 3000 python tools/profile_train_step.py prod1024 2>&1 | tail -20
echo "done -> $OUT"
