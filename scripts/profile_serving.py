"""Stage breakdown of the full-quality serving batch (real TPU).

Times the four device stages of infer/serving.synthesize_batch
(serving.py:122-210) with a host sync after each — AR generate (B*K rows),
CLVP rerank, code pad, fused render (latent + diffusion + vocos) — using
the SAME jitted programs the production path runs, so the shares directly
answer "where would an AR-stage kernel (batched fused step / int8 KV /
cache ladder) move the serving headline?".

Forcing a sync per stage removes some dispatch overlap (PERF.md: only host
syncs pay the ~20 ms tunnel RTT), so the summed stage wall time slightly
exceeds the unsynced batch wall time — both are printed; trust the shares.

Run: python scripts/profile_serving.py   (holds the chip; run alone)
Env: PS_B (16), PS_K (2), PS_STEPS (50 diffusion steps), PS_MAX_GEN (300),
     PS_REPS (3), PS_LADDER ("" = monolithic cache, e.g. "128,256"),
     PS_CONFIG (XTTSConfig JSON override — tiny config for CPU smoke,
     with JAX_PLATFORMS=cpu).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench import synthetic_inputs
from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.infer.api import TTSSettings, TextToSpeech, bucket_len

B = int(os.environ.get("PS_B", 16))
K = int(os.environ.get("PS_K", 2))
STEPS = int(os.environ.get("PS_STEPS", 50))
MAX_GEN = int(os.environ.get("PS_MAX_GEN", 300))
REPS = int(os.environ.get("PS_REPS", 3))
_lad = os.environ.get("PS_LADDER", "")
LADDER = tuple(int(x) for x in _lad.split(",") if x) or None


def sync(x):
    """Host-fetch a scalar (block_until_ready can return early on this
    tunnel — PERF.md)."""
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def main():
    cfg_path = os.environ.get("PS_CONFIG", "")
    cfg = XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    from xtts_tpu.models.clvp import CLVP
    tts.clvp = CLVP(cfg.clvp, dtype=jnp.bfloat16)
    tts.vars["clvp"] = jax.jit(tts.clvp.init)(
        jax.random.PRNGKey(5), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32))

    cond_mel, text_tokens = synthetic_inputs(tts, cfg)
    settings = TTSSettings(max_mel_tokens=MAX_GEN, diffusion_steps=STEPS,
                           num_candidates=K, cache_ladder=LADDER)

    texts = jnp.asarray(np.repeat(text_tokens, B, axis=0))       # (B, T)
    cond = jnp.tile(cond_mel, (B, 1, 1))
    texts_k = jnp.repeat(texts, K, axis=0)
    cond_k = jnp.repeat(cond, K, axis=0)
    text_lens = jnp.full((B,), texts.shape[1], jnp.int32)
    from xtts_tpu.models.aa_diffusion import normalize_tacotron_mel
    diff_cond_norm = normalize_tacotron_mel(cond)

    def stages(key):
        """Mirror of serving.py:122-210 with one sync per stage."""
        out = {}
        t0 = time.perf_counter()
        res = tts._generate(cond_k, texts_k, key, settings)
        sync(res.lengths)
        out["ar_generate"] = time.perf_counter() - t0

        s_gen = res.codes.shape[1]
        t0 = time.perf_counter()
        code_mask = (jnp.arange(s_gen)[None, :]
                     < res.lengths[:, None]).astype(jnp.int32)
        scores = tts._clvp_rerank_batch_jit(
            tts.vars["clvp"], texts,
            jnp.clip(res.codes, 0,
                     cfg.clvp.num_speech_tokens - 1).reshape(B, K, s_gen),
            code_mask=code_mask.reshape(B, K, s_gen))
        best = jnp.argmax(scores, axis=1)
        codes_dev = jnp.take_along_axis(
            res.codes.reshape(B, K, s_gen), best[:, None, None], axis=1)[:, 0]
        lengths_dev = jnp.take_along_axis(
            res.lengths.reshape(B, K), best[:, None], axis=1)[:, 0]
        sync(codes_dev[:, :1])
        out["clvp_rerank"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        lengths = np.asarray(lengths_dev)
        ns = np.maximum(lengths - 2, 1)
        n_b = bucket_len(int(ns.max()), tts._code_buckets())
        codes = tts._pad_codes_jit(codes_dev,
                                   jnp.asarray(np.minimum(ns, n_b), jnp.int32),
                                   n_b=n_b)
        sync(codes[:, :1])
        out["pad_codes"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        wav = tts._render_full_jit(
            tts.vars["gpt"], tts.vars["diffusion"], tts.vars["vocos"],
            cond, diff_cond_norm, texts, text_lens, codes,
            jnp.asarray(ns * cfg.gpt.mel_length_compression, jnp.int32),
            jax.random.fold_in(key, 1), settings.diffusion_temperature,
            steps=STEPS, sampler=settings.sampler,
            cond_free_k=settings.cond_free_k)
        sync(wav[:, :8])
        out["render_full"] = time.perf_counter() - t0
        audio_s = float(ns.sum()) * cfg.vqvae.compression \
            * cfg.vocos.hop_length / cfg.mel.sample_rate
        return out, audio_s

    print(f"profile_serving: B={B} K={K} steps={STEPS} max_gen={MAX_GEN} "
          f"ladder={LADDER}", flush=True)
    # compile pass: run every timed key once untimed so all code-length
    # buckets are compiled before measurement (a different key can land in
    # a different bucket -> full-model recompile inside a timed stage)
    for i in range(REPS):
        stages(jax.random.PRNGKey(i))
    rows = []
    for i in range(REPS):
        out, audio_s = stages(jax.random.PRNGKey(i))
        total = sum(out.values())
        rows.append(out)
        shares = " ".join(f"{k}={v*1000:.0f}ms({v/total:.0%})"
                          for k, v in out.items())
        print(f"rep{i}: total={total*1000:.0f}ms audio={audio_s:.1f}s "
              f"synced-thr={audio_s/total:.1f} audio-s/s | {shares}",
              flush=True)
    med = {k: float(np.median([r[k] for r in rows])) for k in rows[0]}
    tot = sum(med.values())
    print("median shares: " + " ".join(
        f"{k}={v/tot:.0%}" for k, v in med.items()), flush=True)


if __name__ == "__main__":
    main()
