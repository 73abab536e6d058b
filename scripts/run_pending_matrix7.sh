#!/bin/bash
# Phase 7: the composition decider at B=8 K=2 (16 AR rows — the fused
# kernel's domain): does fused+refnet5 stack, and does B=8 fused+refnet5
# beat the B=16 refnet5 pipeline? One process, variants round-robin.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix6.pid ]; then
  while kill -0 "$(cat /tmp/matrix6.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix7] $name already done, skipping"
    return
  fi
  echo "[matrix7] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix7] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run pipe_fused_refnet_b8 7200 AB_B=8 AB_REPS=7 AB_VARIANTS=base,fused,refnet5,fused_refnet5 python scripts/ab_serving_pipeline.py

echo "[matrix7] ALL DONE $(date +%H:%M:%S)"
