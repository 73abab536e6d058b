"""Same-moment A/B: fused batched serving decode step vs the XLA chain.

ops/serving_step.py fuses the WHOLE per-token serving step (B in {8, 16})
into one pallas_call — grouped int8 weight-DMA ring + chunked online-softmax
attention over an int8 row-quantized KV cache. Traffic accounting says up to
~3x headroom over the measured XLA bf16-cache step (PERF.md); this script is
the in-program proof the env gate XTTS_FUSED_SERVING=1 waits for.

Times the AR program ONLY (the serving pipeline's dominant stage),
interleaved A/B/A to cancel tunnel drift. Variants:
  xla        — the shipped XLA int8-weight step chain (bf16 cache)
  xla-kvq    — + int8 KV cache (quantize_kv_cache=True)
  fused-serv — the fused serving kernel (int8 rowwise KV)

Run: python scripts/ab_fused_serving.py    (holds the TPU; run alone)
Env: AB_B (default 8; 16 = B8 x K2 rerank rows), AB_MAX_GEN (600),
     AB_REPS (5), AB_LADDER ("" = monolithic; e.g. "128,256").
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("AB_B", 8))
MAX_GEN = int(os.environ.get("AB_MAX_GEN", 600))
REPS = int(os.environ.get("AB_REPS", 5))
_lad = os.environ.get("AB_LADDER", "")
LADDER = tuple(int(x) for x in _lad.split(",") if x) or None

VARIANTS = {
    "xla": dict(),
    "xla-kvq": dict(quantize_kv_cache=True),
    "fused-serv": dict(use_fused_serving=True),
}


def main():
    from bench import synthetic_inputs
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.qdecode import (attach_fused_stack,
                                        generate_speech_quantized)
    from xtts_tpu.infer.api import TextToSpeech

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    attach_fused_stack(tts._qtree, cfg.gpt)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg)
    cond = jnp.tile(cond_mel, (B, 1, 1))
    text = jnp.tile(jnp.asarray(text_tokens), (B, 1))

    def make(kw):
        def run(key):
            res = generate_speech_quantized(
                tts.gpt, tts.vars["gpt"], tts._qtree, cond, text, key,
                max_gen=MAX_GEN, do_sample=False, cache_ladder=LADDER, **kw)
            jax.block_until_ready(res.codes)
            return int(res.steps), np.asarray(res.codes)
        return run

    fns = {name: make(kw) for name, kw in VARIANTS.items()}
    codes = {}
    for name, f in fns.items():
        t0 = time.perf_counter()
        steps, codes[name] = f(jax.random.PRNGKey(0))
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f} s "
              f"({steps} steps)", flush=True)
    ref = codes["xla"]
    for name in VARIANTS:
        agree = float((codes[name] == ref).mean())
        print(f"{name}: greedy agreement vs xla {agree:.3f}", flush=True)

    times = {name: [] for name in VARIANTS}
    steps = {name: 0 for name in VARIANTS}
    for r in range(REPS):
        for name in VARIANTS:      # interleaved to cancel drift
            t0 = time.perf_counter()
            n, _ = fns[name](jax.random.PRNGKey(r + 1))
            times[name].append(time.perf_counter() - t0)
            steps[name] += n
    base = np.median(times["xla"])
    for name in VARIANTS:
        med = np.median(times[name])
        n = steps[name] / REPS
        print(f"{name}: median {med:6.3f} s ({med / n * 1000:5.2f} ms/step "
              f"x {n:.0f}, {base / med:.3f}x vs xla)", flush=True)


if __name__ == "__main__":
    main()
