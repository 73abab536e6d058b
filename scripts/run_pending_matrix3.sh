#!/bin/bash
# Phase 3: same-process pipeline-level serving A/Bs (cross-process numbers
# proved untrustworthy this chip-day — see ab_serving_pipeline.py).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix2.pid ]; then
  while kill -0 "$(cat /tmp/matrix2.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix3] $name already done, skipping"
    return
  fi
  echo "[matrix3] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix3] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run pipe_b16 5400 AB_B=16 AB_VARIANTS=base,kvq,ladder,kvq_ladder python scripts/ab_serving_pipeline.py
run pipe_b8  5400 AB_B=8  AB_VARIANTS=base,kvq,fused,kvq_ladder python scripts/ab_serving_pipeline.py

echo "[matrix3] ALL DONE $(date +%H:%M:%S)"
