#!/bin/bash
# Phase 13: the two train families whose FUSED step compiles exceed the
# remote-compile transport's ~28-30 min limit (diffusion 27.5 min, GAN
# 30.2 min broken pipes — PERF.md round 4). BENCH_SPLIT_FROZEN=1 runs the
# frozen DVAE->GPT latent pass as its OWN jitted program (same math,
# equality pinned in tests/test_train.py), so each XLA program compiles
# separately. Fallbacks shrink batch if the residual compile still trips.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix12.pid ]; then
  while kill -0 "$(cat /tmp/matrix12.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix13] $name already done, skipping"
    return 0
  fi
  echo "[matrix13] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix13] DONE  $name rc=$rc $(date +%H:%M:%S)"
  return $rc
}

ok() { [ -s "$OUT/$1.log" ] && grep -q "=== DONE rc=0" "$OUT/$1.log"; }

run train_diffusion_split 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=diffusion \
    BENCH_SPLIT_FROZEN=1 python bench.py
if ! ok train_diffusion_split; then
  run train_diffusion_split_bs4 3600 BENCH_PATH=train \
      BENCH_TRAIN_FAMILY=diffusion BENCH_SPLIT_FROZEN=1 BENCH_TRAIN_BS=4 \
      python bench.py
fi

run train_hifigan_split 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=hifigan \
    BENCH_SPLIT_FROZEN=1 python bench.py
if ! ok train_hifigan_split; then
  run train_hifigan_split_bs2 3600 BENCH_PATH=train \
      BENCH_TRAIN_FAMILY=hifigan BENCH_SPLIT_FROZEN=1 BENCH_TRAIN_BS=2 \
      python bench.py
fi

echo "[matrix13] ALL DONE $(date +%H:%M:%S)"
