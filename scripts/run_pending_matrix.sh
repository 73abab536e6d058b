#!/bin/bash
# Round-4 pending on-chip measurement matrix (PERF.md:525-573, VERDICT r3 #1).
# Runs every pending A/B + bench sequentially (one process holds the chip),
# logging each to measurements_r4/<name>.log. Ordered by decision priority so
# a tunnel drop mid-run still leaves the highest-leverage answers on disk.
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE" "$OUT/$name.log"; then
    echo "[matrix] $name already done, skipping"
    return
  fi
  echo "[matrix] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix] DONE  $name rc=$rc $(date +%H:%M:%S)"
}

# --- 1. Fused batched serving step: the biggest undecided lever -------------
run ab_fused_b8   3600 AB_B=8  python scripts/ab_fused_serving.py
run ab_fused_b16  3600 AB_B=16 python scripts/ab_fused_serving.py
# with ladder: fused kernel + rung growth
run ab_fused_b16_ladder 3600 AB_B=16 AB_LADDER=128,256 python scripts/ab_fused_serving.py

# --- 2. Cache ladder at serving batch --------------------------------------
run ab_ladder_b32 3600 AB_B=32 python scripts/ab_cache_ladder.py

# --- 3. Serving pipeline: baseline control + lever stacks -------------------
run serving_base       2400 BENCH_PATH=serving BENCH_BATCH=16 python bench.py
run serving_kvq        2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_KV_QUANT=1 python bench.py
run serving_kvq_ladder 2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_KV_QUANT=1 BENCH_CACHE_LADDER=128,256 python bench.py
run serving_ladder     2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_CACHE_LADDER=128,256 python bench.py

# --- 4. Stage shares at the headline shape ----------------------------------
run profile_serving 2400 PS_B=16 PS_K=2 python scripts/profile_serving.py

# --- 5. Continuous batching vs waves ----------------------------------------
run ab_slots      3600 AB_N=64 AB_B=16 python scripts/ab_slots.py
run ab_slots_kvq  3600 AB_N=64 AB_B=16 AB_KV_QUANT=1 python scripts/ab_slots.py
run ab_compaction 3600 AB_B=16 python scripts/ab_compaction.py
run bench_slots   2400 BENCH_PATH=slots BENCH_BATCH=16 python bench.py

# --- 6. Remaining BASELINE / lever singles ----------------------------------
run bench_hifigan   2400 BENCH_PATH=hifigan python bench.py
run serving_refnet5 2400 BENCH_PATH=serving BENCH_BATCH=16 BENCH_REFNET_INTERVAL=5 python bench.py

# --- 7. Trainer-step throughput, all 6 families ------------------------------
for fam in gpt vqvae diffusion clvp classifier hifigan; do
  run train_$fam 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=$fam python bench.py
done
run train_gpt_remat 3600 BENCH_PATH=train BENCH_TRAIN_FAMILY=gpt BENCH_REMAT=full python bench.py

# --- 8. e2e control (same chip-day anchor) ----------------------------------
run e2e_control 2400 BENCH_PATH=e2e python bench.py

echo "[matrix] ALL DONE $(date +%H:%M:%S)"
