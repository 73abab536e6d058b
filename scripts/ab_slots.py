"""Steady-state A/B: continuous batching (slot serving) vs wave serving.

Drains N requests with SPREAD stop times (stop-logit-biased weights, as in
ab_compaction.py) through the AR stage only — renders are identical in
both arms, the AR scheduling is what differs:

  waves     — batches of B via the monolithic quantized engine (+ladder;
              the BatchServer pattern): each wave holds the chip until its
              slowest row stops.
  slots     — SlotDecoder pool of B: finished rows are harvested and
              refilled every segment, so the pool stays full; the
              trade-off is that every step reads the full S_max cache
              (no ladder) while waves read ladder-sized caches early.

Reports drain wall time and audio-s/s (sum of generated tokens x 1024
samples / 24 kHz over wall time).

Run: python scripts/ab_slots.py    (holds the TPU; run alone)
Env: AB_N (default 64 requests), AB_B (16 slots / wave rows),
     AB_MAX_GEN (600), AB_SEGMENT (32), AB_STOP_BIAS (probe default),
     AB_LADDER ("128,256" — wave arm only), AB_KV_QUANT=1 (int8 slot
     cache — halves the full-S_max read that is the slot arm's handicap).
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

N = int(os.environ.get("AB_N", 64))
B = int(os.environ.get("AB_B", 16))
MAX_GEN = int(os.environ.get("AB_MAX_GEN", 600))
SEGMENT = int(os.environ.get("AB_SEGMENT", 32))
LADDER = tuple(int(x) for x in
               os.environ.get("AB_LADDER", "128,256").split(",") if x)


def main():
    from bench import synthetic_inputs
    from scripts.ab_compaction import bias_stop
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TextToSpeech
    from xtts_tpu.infer.qdecode import (generate_speech_quantized,
                                        quantize_gpt_decode)
    from xtts_tpu.infer.slots import SlotDecoder

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg)
    text = jnp.asarray(text_tokens)

    env_bias = os.environ.get("AB_STOP_BIAS")
    biases = [float(env_bias)] if env_bias else [2.0, 3.0, 4.0, 5.0, 6.0]
    probe_cond = jnp.tile(cond_mel, (B, 1, 1))
    probe_text = jnp.tile(text, (B, 1))
    for bias in biases:
        gvars = bias_stop(tts.vars["gpt"], cfg.gpt, bias)
        qtree = quantize_gpt_decode(gvars, cfg.gpt, include_fused=False)
        r = generate_speech_quantized(tts.gpt, gvars, qtree, probe_cond,
                                      probe_text, jax.random.PRNGKey(0),
                                      max_gen=MAX_GEN, cache_ladder=LADDER)
        lens = np.asarray(r.lengths)
        print(f"probe bias={bias}: lengths mean {lens.mean():.0f} "
              f"min {lens.min()} max {lens.max()}", flush=True)
        if lens.mean() <= 0.5 * MAX_GEN:
            break
    tts.vars["gpt"] = gvars
    tts._qtree = qtree

    # ---- wave arm -------------------------------------------------------
    def drain_waves(seed):
        total = 0
        t0 = time.perf_counter()
        for w in range(N // B):
            r = generate_speech_quantized(
                tts.gpt, gvars, qtree, probe_cond, probe_text,
                jax.random.PRNGKey(seed * 131 + w), max_gen=MAX_GEN,
                cache_ladder=LADDER)
            total += int(np.asarray(r.lengths).sum())
        return time.perf_counter() - t0, total

    # ---- slot arm -------------------------------------------------------
    def drain_slots(seed):
        from xtts_tpu.infer.api import TTSSettings
        kvq = os.environ.get("AB_KV_QUANT", "0") == "1"
        dec = SlotDecoder(tts, n_slots=B, max_gen=MAX_GEN,
                          segment_len=SEGMENT,
                          text_buckets=(text.shape[1],),
                          settings=TTSSettings(max_mel_tokens=MAX_GEN,
                                               kv_quant=kvq))
        padded = dec.pad_text(np.asarray(text_tokens[0]))
        total = 0
        pending = N
        live = set()
        t0 = time.perf_counter()
        for s in range(B):
            if pending:
                dec.install(s, padded, cond_mel)
                live.add(s)
                pending -= 1
        while live:
            done, gen = dec.run_segment()
            for s in [s for s in live if done[s]]:
                total += int(gen[s])
                live.remove(s)
                if pending:
                    dec.install(s, padded, cond_mel)
                    live.add(s)
                    pending -= 1
        return time.perf_counter() - t0, total

    for name, f in (("waves", drain_waves), ("slots", drain_slots)):
        dt, total = f(0)       # compile pass
        print(f"{name}: compile+drain {dt:.1f} s ({total} tokens)",
              flush=True)

    results = {"waves": [], "slots": []}
    for rep in range(3):
        for name, f in (("waves", drain_waves), ("slots", drain_slots)):
            dt, total = f(rep + 1)
            thr = total * 1024 / 24000.0 / dt
            results[name].append(thr)
            print(f"{name} rep{rep}: {dt:6.2f} s drain, {thr:6.1f} "
                  f"audio-s/s ({total} tokens)", flush=True)
    w, s = np.median(results["waves"]), np.median(results["slots"])
    print(f"median waves {w:.1f} vs slots {s:.1f} audio-s/s "
          f"-> slots {s / w:.3f}x", flush=True)


if __name__ == "__main__":
    main()
