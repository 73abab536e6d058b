"""Same-PROCESS sweep of serving batch size at the round-4 defaults.

Round 3 found B=16 K=2 the rerank sweet spot with a MONOLITHIC cache —
the ladder (now the >=16-row default) specifically attacks the large-B AR
cache cost, so the sweet spot may have moved up. One process, batch sizes
round-robin, full-quality synthesize_batch (K CLVP candidates + 50-step
CFG render); audio-s/s per arm.

Run: python scripts/ab_serving_batch.py   (holds the TPU; run alone)
Env: AB_BATCHES (default "16,24,32"), AB_K (2), AB_MAX_GEN (300),
     AB_STEPS (50), AB_REPS (5).
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

from bench import synthetic_inputs
from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.infer.api import TTSSettings, TextToSpeech

BATCHES = [int(b) for b in os.environ.get("AB_BATCHES", "16,24,32").split(",")]
K = int(os.environ.get("AB_K", 2))
MAX_GEN = int(os.environ.get("AB_MAX_GEN", 300))
STEPS = int(os.environ.get("AB_STEPS", 50))
REPS = int(os.environ.get("AB_REPS", 5))


def main():
    cfg_path = os.environ.get("AB_CONFIG", "")
    cfg = (XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig())
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True, with_clvp=True)
    tl = min(50, cfg.gpt.max_text_tokens - 4, cfg.clvp.text_seq_len - 4)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg, text_len=tl)
    tmax = cfg.diffusion.clip.max_patches * cfg.diffusion.clip.patch_size
    if cond_mel.shape[-1] > tmax:
        cond_mel = cond_mel[:, :, :tmax]
    sr = cfg.mel.sample_rate

    from xtts_tpu.infer.serving import SynthesisRequest, synthesize_batch
    s = TTSSettings(max_mel_tokens=MAX_GEN, diffusion_steps=STEPS,
                    num_candidates=K)   # cache_ladder="auto" default

    def run(b, key):
        reqs = [SynthesisRequest(text_tokens[0]) for _ in range(b)]
        wavs = synthesize_batch(tts, reqs, cond_mel, s,
                                use_diffusion=True, key=key)
        return sum(w.size for w in wavs) / sr

    for b in BATCHES:
        t0 = time.perf_counter()
        run(b, jax.random.PRNGKey(99))
        print(f"B={b}: compile+run {time.perf_counter() - t0:.1f} s",
              flush=True)

    times = {b: [] for b in BATCHES}
    audio = {b: [] for b in BATCHES}
    for r in range(REPS):
        for b in BATCHES:
            t0 = time.perf_counter()
            a = run(b, jax.random.PRNGKey(r))
            times[b].append(time.perf_counter() - t0)
            audio[b].append(a)
    for b in BATCHES:
        med = float(np.median(times[b]))
        thr = float(np.median(audio[b])) / med
        print(f"B={b}: median {med:6.2f} s  {thr:6.1f} audio-s/s  "
              f"(audio {np.median(audio[b]):.1f} s)", flush=True)


if __name__ == "__main__":
    main()
