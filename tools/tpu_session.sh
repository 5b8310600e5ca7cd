#!/bin/bash
# One-command TPU evidence session (run the moment the tunnel is back):
#   bash tools/tpu_session.sh
#
# 1. bench.py baseline + kernel A/B matrix     -> /tmp/ab_bench_results.jsonl
# 2. TPU-marked kernel tests (Mosaic-compiled) -> /tmp/tpu_tests.log
# 3. prod1024 train-step profile (criterion share after the round-3
#    MaskDINO linear-head change)              -> /tmp/prod1024_profile.log
# 4. vith1024 train-step profile (VERDICT r2 task 5) -> /tmp/vith1024_profile.log
#
# Every step is timeout-bounded; a hang in one step does not eat the session.
set -u
cd "$(dirname "$0")/.."

echo "== tunnel check ($(date +%H:%M:%S))"
if ! timeout -s KILL 90 python -c "import jax; print(jax.devices())"; then
  echo "tunnel still down; aborting"; exit 1
fi

echo "== 1. bench + kernel A/B"
bash tools/tpu_ab_bench.sh "${BENCH_ITERS:-10}" 2>&1 | tee /tmp/tpu_session_ab.log

echo "== 2. TPU-marked kernel tests"
timeout 3600 env HIPIE_TESTS_TPU=1 python -m pytest tests -m tpu -q \
  2>&1 | tee /tmp/tpu_tests.log | tail -5

echo "== 3. prod1024 profile (already run inside tpu_ab_bench.sh; skip)"

echo "== 4. vith1024 profile"
timeout 5400 python tools/profile_train_step.py vith1024 \
  2>&1 | tee /tmp/vith1024_profile.log | tail -25

echo "== done ($(date +%H:%M:%S)) — record results in PERFORMANCE.md and"
echo "   flip kernel defaults only for measured in-program wins."
