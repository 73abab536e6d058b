"""Same-moment A/B: segmented KV-cache ladder in the serving AR decode.

At serving batch sizes the decode step is dominated by K/V cache reads:
every step reads the FULL preallocated (prefix+max_gen)-position cache per
layer (B=48: ~3 GB/step vs ~0.2 GB of int8 weights). The ladder
(gpt_infer.generate_speech cache_ladder) runs the decode as segmented
while_loops against progressively larger caches, so steps 0..cap_i read
only prefix+cap_i positions — TPU-shaped KV-cache paging, token-exact
(tests/test_gpt.py::TestCacheLadder).

Times the AR program ONLY (the serving pipeline's dominant stage) at the
serving shape: B rows x the bench text, interleaved A/B/A to cancel
tunnel drift.

Run: python scripts/ab_cache_ladder.py    (holds the TPU; run alone)
Env: AB_B (default 32 = B16 x K2 rerank rows), AB_MAX_GEN (600; bench
     text generates to the cap with random weights), AB_REPS (5),
     AB_LADDERS ("none;64,128,256;128,256" — ';'-separated variants).
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

B = int(os.environ.get("AB_B", 32))
MAX_GEN = int(os.environ.get("AB_MAX_GEN", 600))
REPS = int(os.environ.get("AB_REPS", 5))
LADDERS = os.environ.get("AB_LADDERS", "none;64,128,256;128,256").split(";")


def parse(s):
    return None if s == "none" else tuple(int(x) for x in s.split(","))


def main():
    from bench import synthetic_inputs
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TextToSpeech
    from xtts_tpu.infer.qdecode import generate_speech_quantized

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg)
    cond = jnp.tile(cond_mel, (B, 1, 1))
    text = jnp.tile(jnp.asarray(text_tokens), (B, 1))

    def make(ladder):
        def run(key):
            res = generate_speech_quantized(
                tts.gpt, tts.vars["gpt"], tts._qtree, cond, text, key,
                max_gen=MAX_GEN, use_fused=False, cache_ladder=ladder)
            jax.block_until_ready(res.codes)
            return int(res.steps)
        return run

    fns = {s: make(parse(s)) for s in LADDERS}
    for s, f in fns.items():
        t0 = time.perf_counter()
        steps = f(jax.random.PRNGKey(0))
        print(f"ladder={s}: compile+run {time.perf_counter() - t0:.1f} s "
              f"({steps} steps)", flush=True)

    times = {s: [] for s in LADDERS}
    steps = {s: 0 for s in LADDERS}
    for r in range(REPS):
        for s in LADDERS:          # interleaved to cancel drift
            t0 = time.perf_counter()
            n = fns[s](jax.random.PRNGKey(r + 1))
            times[s].append(time.perf_counter() - t0)
            steps[s] += n
    base = np.median(times[LADDERS[0]])
    for s in LADDERS:
        med = np.median(times[s])
        n = steps[s] / REPS
        print(f"ladder={s}: median {med:6.3f} s ({med / n * 1000:5.2f} "
              f"ms/step x {n:.0f}, {base / med:.3f}x vs {LADDERS[0]})",
              flush=True)


if __name__ == "__main__":
    main()
