#!/bin/bash
# Phase 15/16 (round 5): the chip matrix after the remote-compile ROOT-CAUSE
# fix. Phase-13's "compile hangs" were never compiler pathology: the latent /
# fused-train programs closed over the frozen GPT+DVAE params, so jit embedded
# ~0.9-1.1 GB of constants into the serialized HLO; the remote-compile POST
# either trips the service's body limit (HTTP 413 — stack probe, 2026-08-20
# 22:55) or uploads through the tunnel until the HTTP pipe drops at ~25-30 min
# (every "hang"). Fix: frozen params are runtime ARGUMENTS everywhere
# (diffusion_latent_impl, Trainer/GANTrainer frozen=..., PERF.md round 5).
#
# Sequence (each run alone on the chip):
#   1-2  split-frozen train benches for the two blocked families
#   3-4  FUSED one-program variants (frozen-as-args) — discriminates "payload
#        was everything" vs "conv-heavy backward is also genuinely slow to
#        compile"; gated on the split run succeeding (ADVICE r4: don't chain
#        follow-ups onto a failure mode they share)
#   5    GPT train-step trace accounting (VERDICT r4 #5)
#   6-7  vqvae/classifier batch-scaling probes at bs 64/128/256 (VERDICT #5)
#   8    diffusion render per-op profile at serving batch (VERDICT #4)
set -u
cd "$(dirname "$0")/.."
OUT=measurements_r5
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_xtts"

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -s "$OUT/$name.log" ] && grep -q "=== DONE rc=0" "$OUT/$name.log"; then
    echo "[matrix15] $name already done, skipping"
    return 0
  fi
  echo "[matrix15] START $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  ( timeout "$tmo" env "$@" ) >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== DONE rc=$rc $(date +%H:%M:%S)" >>"$OUT/$name.log"
  echo "[matrix15] DONE  $name rc=$rc $(date +%H:%M:%S)"
  return $rc
}

ok() { [ -s "$OUT/$1.log" ] && grep -q "=== DONE rc=0" "$OUT/$1.log"; }

# 1-2: split-frozen benches (two programs, both now small-payload)
run train_diffusion_split_fix 3600 BENCH_PATH=train \
    BENCH_TRAIN_FAMILY=diffusion BENCH_SPLIT_FROZEN=1 python bench.py
run train_hifigan_split_fix 3600 BENCH_PATH=train \
    BENCH_TRAIN_FAMILY=hifigan BENCH_SPLIT_FROZEN=1 python bench.py

# 3-4: fused one-program steps (reference semantics), frozen-as-args
if ok train_diffusion_split_fix; then
  run train_diffusion_fused 3600 BENCH_PATH=train \
      BENCH_TRAIN_FAMILY=diffusion python bench.py
fi
if ok train_hifigan_split_fix; then
  run train_hifigan_fused 3600 BENCH_PATH=train \
      BENCH_TRAIN_FAMILY=hifigan python bench.py
fi

# 5: GPT train-step component accounting (is 34% MFU the shape's ceiling?)
run trace_gpt_train 2400 python scripts/trace_gpt_train.py

# 6-7: "latency-bound, scales with bs" claims, probed (same-process A/B)
run ab_scaling_vqvae 2400 AB_FAMILY=vqvae AB_BS=64,128,256 \
    python scripts/ab_train_scaling.py
run ab_scaling_classifier 2400 AB_FAMILY=classifier AB_BS=64,128,256 \
    python scripts/ab_train_scaling.py

# 8: render per-op profile at the serving batch (roofline accounting)
run profile_diffusion_b16 2400 PROF_B=16 PROF_STEPS=10 \
    python scripts/profile_diffusion.py

echo "[matrix15] ALL DONE $(date +%H:%M:%S)"
