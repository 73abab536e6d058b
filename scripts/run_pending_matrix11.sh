#!/bin/bash
# Phase 11: GPT train batch-scaling same-process A/B (cross-process bs32
# single said 0.57x of bs8 — drift-suspect).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix10.pid ]; then
  while kill -0 "$(cat /tmp/matrix10.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix11] $name already done, skipping"
    return
  fi
  echo "[matrix11] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix11] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run ab_train_scaling 5400 python scripts/ab_train_scaling.py

echo "[matrix11] ALL DONE $(date +%H:%M:%S)"
