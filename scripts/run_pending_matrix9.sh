#!/bin/bash
# Phase 9: compose the two measured pipeline winners — ladder (AR, 1.40x
# at B=16 K=2 in pipe_b16) x refnet5 (render) — plus the fused b16k1
# single that died on a tunnel transport error in phase 2.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix8.pid ]; then
  while kill -0 "$(cat /tmp/matrix8.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix9] $name already done, skipping"
    return
  fi
  echo "[matrix9] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix9] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run pipe_compose_b16 7200 AB_B=16 AB_REPS=7 AB_VARIANTS=base,ladder,kvq_ladder,refnet5_ladder,refnet3_ladder python scripts/ab_serving_pipeline.py
run serving_fused_b16k1 2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_RERANK_K=1 XTTS_FUSED_SERVING=1 python bench.py

echo "[matrix9] ALL DONE $(date +%H:%M:%S)"
