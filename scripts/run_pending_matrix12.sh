#!/bin/bash
# Phase 12: final-defaults measurements — serving batch sweep at the
# auto-ladder default (the sweet spot may have moved above B=16 now that
# the ladder cuts the large-B AR cache cost), then 3 cross-process
# serving singles at the best batch + an e2e anchor (drift bracketing for
# the round-4 headline).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix11.pid ]; then
  while kill -0 "$(cat /tmp/matrix11.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix12] $name already done, skipping"
    return
  fi
  echo "[matrix12] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix12] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run ab_serving_batch 7200 AB_BATCHES=16,24,32 python scripts/ab_serving_batch.py
run serving_final_1 2400 BENCH_PATH=serving BENCH_BATCH=16 python bench.py
run e2e_anchor_2    2400 BENCH_PATH=e2e python bench.py
run serving_final_2 2400 BENCH_PATH=serving BENCH_BATCH=16 python bench.py
run serving_final_3 2400 BENCH_PATH=serving BENCH_BATCH=16 python bench.py

echo "[matrix12] ALL DONE $(date +%H:%M:%S)"
