"""Micro-attribution for the two non-render e2e stages (real TPU).

1. AR decode: sampled (HF-order top-p, the live path — rep-penalty +
   binary-search nucleus filter + categorical per step) vs greedy,
   same-moment, fused int8 engine. Attributes the per-step cost of the
   sampling ops.
2. Host fetch: device->host transfer time for the e2e wav size in f32 vs
   int16 — is the ~1.2 MB wav fetch RTT-bound or bandwidth-bound on this
   tunnel?

Run: python scripts/ab_ar_fetch.py  (holds the TPU; run alone)
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
REPS = int(os.environ.get("AB_REPS", 7))


def main():
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TextToSpeech
    from xtts_tpu.infer.qdecode import (attach_fused_stack,
                                        generate_speech_quantized)

    from bench import synthetic_inputs

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    attach_fused_stack(tts._qtree, cfg.gpt)
    cond_mel, text_np = synthetic_inputs(tts, cfg)
    text = jnp.asarray(text_np)

    def gen(key, do_sample):
        res = generate_speech_quantized(
            tts.gpt, tts.vars["gpt"], tts._qtree, cond_mel, text, key,
            max_gen=MAX_GEN, do_sample=do_sample, use_fused=True)
        steps = int(res.steps)          # host sync
        return steps

    for ds in (False, True):            # compile both
        gen(jax.random.PRNGKey(99), ds)
    times = {False: [], True: []}
    steps = {False: 0, True: 0}
    for i in range(REPS):
        for ds in (False, True):
            t0 = time.perf_counter()
            steps[ds] += gen(jax.random.PRNGKey(i), ds)
            times[ds].append(time.perf_counter() - t0)
    for ds in (False, True):
        med = float(np.median(times[ds]))
        n = steps[ds] / REPS
        print(f"do_sample={int(ds)}: p50 {med * 1000:6.1f} ms "
              f"({n:.0f} steps, {med / n * 1000:.3f} ms/step)", flush=True)
    d = np.median(times[True]) - np.median(times[False])
    print(f"sampling ops cost: {d * 1000:+.1f} ms per {MAX_GEN}-token call")

    # -- fetch bandwidth --
    n_samp = 305 * 1024                 # e2e wav length at bucket 320
    wav32 = jax.device_put(np.zeros((1, n_samp), np.float32))
    wav16 = jax.device_put(np.zeros((1, n_samp), np.int16))
    small = jax.device_put(np.zeros((1,), np.int32))
    jax.block_until_ready((wav32, wav16, small))
    for name, arr in [("f32 wav (1.2 MB)", wav32),
                      ("int16 wav (0.6 MB)", wav16),
                      ("4-byte scalar", small)]:
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(arr)
            best = min(best, time.perf_counter() - t0)
        print(f"fetch {name}: {best * 1000:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
