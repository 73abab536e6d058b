#!/bin/bash
# Phase 5: rerun trainer benches that failed in phase 1 (train_vqvae hit the
# Pallas-VQ JVP AssertionError on TPU — fixed in ops/vq.py by stop-gradding
# the inputs so value_and_grad's JVP trace short-circuits).
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

if [ -f /tmp/matrix4.pid ]; then
  while kill -0 "$(cat /tmp/matrix4.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix5] $name already done, skipping"
    return
  fi
  echo "[matrix5] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix5] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

# reruns anything without a rc=0 footer: train_vqvae for sure, plus any
# other train family that fails later in phase 1
for fam in gpt vqvae diffusion clvp classifier hifigan; do
  run train_$fam 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=$fam python bench.py
done
run train_gpt_remat 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=gpt BENCH_REMAT=full python bench.py

echo "[matrix5] ALL DONE $(date +%H:%M:%S)"
