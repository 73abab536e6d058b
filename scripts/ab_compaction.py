"""Same-moment A/B: compacting decode waves vs monolithic serving AR.

The monolithic batched decode exits only when ALL rows are done, so every
finished row keeps paying full cache reads until the slowest row stops.
Compacting waves (infer/compact.py) drop finished rows at ladder rung
boundaries and continue at a smaller static row bucket — the win scales
with the spread of per-row stop times, so this A/B biases the mel_head's
stop logit (AB_STOP_BIAS, calibrated by probe) to make random-weight rows
stop at realistic, well-spread lengths instead of all running to the cap.

Reports wall time per wave AND audio-seconds/s (sum of realized lengths x
1024 samples / 24 kHz over wall time) — the serving-relevant metric, since
compaction doesn't change what is generated (greedy token-exact), only how
long the wave holds the chip.

Run: python scripts/ab_compaction.py    (holds the TPU; run alone)
Env: AB_B (default 16), AB_MAX_GEN (600), AB_REPS (5),
     AB_STOP_BIAS (default: probe for mean length ~0.4*max_gen),
     AB_LADDER ("128,256"), AB_BUCKETS ("1,2,4,8,16" filtered to <= B).
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

B = int(os.environ.get("AB_B", 16))
MAX_GEN = int(os.environ.get("AB_MAX_GEN", 600))
REPS = int(os.environ.get("AB_REPS", 5))
LADDER = tuple(int(x) for x in
               os.environ.get("AB_LADDER", "128,256").split(",") if x)
BUCKETS = tuple(b for b in (int(x) for x in os.environ.get(
    "AB_BUCKETS", "1,2,4,8,16").split(",") if x) if b <= B)


def bias_stop(variables, cfg, bias: float):
    p = dict(variables["params"])
    mh = dict(p["mel_head"])
    mh["bias"] = mh["bias"].at[cfg.stop_mel_token].add(bias)
    p["mel_head"] = mh
    out = dict(variables)
    out["params"] = p
    return out


def main():
    from bench import synthetic_inputs
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TextToSpeech
    from xtts_tpu.infer.compact import generate_speech_compacting
    from xtts_tpu.infer.qdecode import (generate_speech_quantized,
                                        quantize_gpt_decode)

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg)
    cond = jnp.tile(cond_mel, (B, 1, 1))
    text = jnp.tile(jnp.asarray(text_tokens), (B, 1))

    env_bias = os.environ.get("AB_STOP_BIAS")
    if env_bias is not None:
        biases = [float(env_bias)]
    else:
        biases = [2.0, 3.0, 4.0, 5.0, 6.0]
    gvars = None
    for bias in biases:  # probe: pick a bias with mean length ~0.4*max_gen
        cand = bias_stop(tts.vars["gpt"], cfg.gpt, bias)
        qt = quantize_gpt_decode(cand, cfg.gpt, include_fused=False)
        r = generate_speech_quantized(tts.gpt, cand, qt, cond, text,
                                      jax.random.PRNGKey(0), max_gen=MAX_GEN,
                                      cache_ladder=LADDER)
        lens = np.asarray(r.lengths)
        print(f"probe bias={bias}: lengths mean {lens.mean():.0f} "
              f"min {lens.min()} max {lens.max()}", flush=True)
        gvars, qtree = cand, qt
        if lens.mean() <= 0.5 * MAX_GEN:
            break
    print(f"using stop bias with mean length {lens.mean():.0f}", flush=True)

    def run_mono(key):
        r = generate_speech_quantized(tts.gpt, gvars, qtree, cond, text, key,
                                      max_gen=MAX_GEN, cache_ladder=LADDER)
        lens = np.asarray(r.lengths)          # host sync
        return lens

    def run_compact(key):
        r = generate_speech_compacting(tts.gpt, gvars, qtree, cond, text, key,
                                       max_gen=MAX_GEN, cache_ladder=LADDER,
                                       row_buckets=BUCKETS)
        return np.asarray(r.lengths)

    fns = {"monolithic": run_mono, "compacting": run_compact}
    for name, f in fns.items():      # compile pass
        t0 = time.perf_counter()
        lens = f(jax.random.PRNGKey(0))
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f} s "
              f"(mean len {lens.mean():.0f})", flush=True)

    times = {n: [] for n in fns}
    audio = {n: 0.0 for n in fns}
    for rep in range(REPS):
        for n, f in fns.items():     # interleaved to cancel tunnel drift
            t0 = time.perf_counter()
            lens = f(jax.random.PRNGKey(rep + 1))
            times[n].append(time.perf_counter() - t0)
            audio[n] += lens.sum() * 1024 / 24000.0
    base = np.median(times["monolithic"])
    for n in fns:
        med = np.median(times[n])
        thr = audio[n] / sum(times[n])
        print(f"{n}: median {med:6.3f} s/wave, {thr:6.1f} audio-s/s, "
              f"{base / med:.3f}x vs monolithic", flush=True)


if __name__ == "__main__":
    main()
