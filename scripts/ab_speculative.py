"""Same-process interleaved A/B: speculative_render on/off (real TPU).

Cross-process bench runs drift more than the effect size (PERF.md: an
A/B/A of three bench.py processes measured 0.0332 / 0.0302 / 0.0289 RTF —
the final control beat the treatment), so the only trustworthy comparison
interleaves both settings inside ONE process against the same compiled
programs.

Run: python scripts/ab_speculative.py  (holds the TPU; run alone)
Env: AB_MAX_GEN (300), AB_STEPS (50), AB_REPS (9).
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

MAX_GEN = int(os.environ.get("AB_MAX_GEN", 300))
STEPS = int(os.environ.get("AB_STEPS", 50))
REPS = int(os.environ.get("AB_REPS", 9))


def main():
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech

    from bench import synthetic_inputs

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg)

    variants = {
        False: TTSSettings(max_mel_tokens=MAX_GEN, diffusion_steps=STEPS),
        True: TTSSettings(max_mel_tokens=MAX_GEN, diffusion_steps=STEPS,
                          speculative_render=True),
    }
    # warm EVERY timed key under both variants: a sampled run that stops
    # early lands in a smaller code bucket, and an uncompiled bucket inside
    # the timed loop would corrupt the A/B with a multi-minute compile
    for spec, s in variants.items():
        for i in range(REPS):
            tts.tts_tokens(text_tokens, cond_mel, jax.random.PRNGKey(i), s,
                           use_diffusion=True)

    times = {False: [], True: []}
    for i in range(REPS):
        for spec in (False, True):
            t0 = time.perf_counter()
            out = tts.tts_tokens(text_tokens, cond_mel, jax.random.PRNGKey(i),
                                 variants[spec], use_diffusion=True)
            times[spec].append(time.perf_counter() - t0)
    for spec in (False, True):
        med = float(np.median(times[spec]))
        print(f"speculative={int(spec)}: p50 {med * 1000:6.1f} ms  "
              f"(min {min(times[spec]) * 1000:6.1f})", flush=True)
    print(f"delta p50: {(np.median(times[False]) - np.median(times[True])) * 1000:+.1f} ms")


if __name__ == "__main__":
    main()
