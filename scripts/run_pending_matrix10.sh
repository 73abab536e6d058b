#!/bin/bash
# Phase 10: compile-timeout fallbacks for the conv-heavy trainer benches
# (diffusion/GAN compiles died twice at the remote-compile ~28-30 min
# transport limit). remat=full produces different HLO (may compile
# differently); smaller batch as the last resort. Skips anything a prior
# phase already landed (rc=0 in the canonical logs).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix9.pid ]; then
  while kill -0 "$(cat /tmp/matrix9.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix10] $name already done, skipping"
    return
  fi
  echo "[matrix10] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix10] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

fallback() {
  # run the fallback only if the canonical log still has no rc=0
  local canon="$1"; shift
  if grep -q "=== DONE rc=0" "$OUT/$canon.log" 2>/dev/null; then
    echo "[matrix10] $canon landed, skipping fallbacks"
    return 1
  fi
  return 0
}

if fallback train_diffusion; then
  run train_diffusion_remat 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=diffusion BENCH_REMAT=full python bench.py
fi
if fallback train_diffusion && fallback train_diffusion_remat; then
  run train_diffusion_bs4 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=diffusion BENCH_TRAIN_BS=4 python bench.py
fi
if fallback train_hifigan; then
  run train_hifigan_bs2 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=hifigan BENCH_TRAIN_BS=2 python bench.py
fi

echo "[matrix10] ALL DONE $(date +%H:%M:%S)"
