#!/bin/bash
# Phase 4: render-stage levers in the same-process pipeline A/B (profile:
# render 69% / AR 25% at B=16 K=2 — refnet_interval attacks the render).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix3.pid ]; then
  while kill -0 "$(cat /tmp/matrix3.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix4] $name already done, skipping"
    return
  fi
  echo "[matrix4] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix4] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run pipe_refnet_b16 7200 AB_B=16 AB_VARIANTS=base,refnet3,refnet5,refnet5_kvq python scripts/ab_serving_pipeline.py

echo "[matrix4] ALL DONE $(date +%H:%M:%S)"
