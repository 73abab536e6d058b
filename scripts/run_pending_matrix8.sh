#!/bin/bash
# Phase 8: fused-kernel VMEM-budget fix validation — B=16 now runs at
# group=1 (the old group=2 program hit the 16 MB scoped-VMEM limit inside
# the ladder-rung program); re-measure plain B=16 and the fused+ladder
# combo that OOM'd.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix7.pid ]; then
  while kill -0 "$(cat /tmp/matrix7.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix8] $name already done, skipping"
    return
  fi
  echo "[matrix8] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix8] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run ab_fused_b16_g1     3600 AB_B=16 python scripts/ab_fused_serving.py
run ab_fused_b16_ladder 3600 AB_B=16 AB_LADDER=128,256 python scripts/ab_fused_serving.py

echo "[matrix8] ALL DONE $(date +%H:%M:%S)"
