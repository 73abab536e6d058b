#!/bin/bash
# Phase 2: reruns after the round-4 fused-kernel 128-alignment fix, plus
# pipeline-level fused-serving A/Bs. Waits for the phase-1 matrix to exit
# (one process holds the chip), then runs sequentially.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix.pid ]; then
  while kill -0 "$(cat /tmp/matrix.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix2] $name already done, skipping"
    return
  fi
  echo "[matrix2] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix2] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

# fixed fused kernel at B=16 (was Mosaic-rejected: 64-wide scale slices)
run ab_fused_b16        3600 AB_B=16 python scripts/ab_fused_serving.py
run ab_fused_b16_ladder 3600 AB_B=16 AB_LADDER=128,256 python scripts/ab_fused_serving.py

# pipeline-level fused serving (kernel supports 8/16 AR rows:
# B=8 x K=2 rerank = 16 rows; B=16 x K=1 = 16 rows)
run serving_fused_b8k2  2400 BENCH_PATH=serving BENCH_BATCH=8 XTTS_FUSED_SERVING=1 python bench.py
run serving_b8k2_base   2400 BENCH_PATH=serving BENCH_BATCH=8 python bench.py
run serving_fused_b16k1 2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_RERANK_K=1 XTTS_FUSED_SERVING=1 python bench.py
run serving_b16k1_base  2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_RERANK_K=1 python bench.py

echo "[matrix2] ALL DONE $(date +%H:%M:%S)"
