#!/bin/bash
# Phase 6: refnet_interval approximation quantification (the render lever's
# quality evidence) + train-bench batch-scaling probes (roofline notes:
# distinguishes latency/BW-bound small-batch steps from compute-bound).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix5.pid ]; then
  while kill -0 "$(cat /tmp/matrix5.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix6] $name already done, skipping"
    return
  fi
  echo "[matrix6] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix6] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

run quality_refnet 3600 QR_KS=3,5 python scripts/quality_refnet.py

run train_gpt_bs32   3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=gpt BENCH_TRAIN_BS=32 python bench.py
run train_vqvae_bs256 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=vqvae BENCH_TRAIN_BS=256 python bench.py

echo "[matrix6] ALL DONE $(date +%H:%M:%S)"
