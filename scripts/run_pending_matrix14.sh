#!/bin/bash
# Phase 14: the diffusion step-count dial — the one remaining lever class
# PERF round 4 names but never measured (the reference's own presets run
# 30-200 sampler iters vs the 50-step live path). Throughput at B=16 K=2
# via the same-process pipeline A/B (REPS=7, the drift-proof protocol),
# then the render-divergence probe on same AR codes.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix13.pid ]; then
  while kill -0 "$(cat /tmp/matrix13.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix14] $name already done, skipping"
    return 0
  fi
  echo "[matrix14] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix14] DONE  $name rc=$rc $(date +%H:%M:%S)"
  return $rc
}

run pipe_steps_b16 7200 AB_B=16 AB_K=2 AB_REPS=7 \
    AB_VARIANTS=base,steps30,steps20,steps30_ladder \
    python scripts/ab_serving_pipeline.py
run quality_steps 3600 python scripts/quality_steps.py

echo "[matrix14] ALL DONE $(date +%H:%M:%S)"
