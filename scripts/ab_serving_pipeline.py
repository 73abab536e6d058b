"""Same-PROCESS A/B of the full-quality serving pipeline across lever stacks.

Round-4 finding: cross-process serving numbers drift up to 3.4x within an
hour on the tunneled chip (base 14.3 / kvq 28.9 / ladder 48.9 audio-s/s in
three adjacent processes — mutually inconsistent with any stage model), so
the pipeline-level lever decisions (VERDICT r3 #1/#2) must come from ONE
process with variants interleaved round-robin, like the ab_* AR scripts.

Measures synthesize_batch full-quality (K CLVP-reranked candidates +
50-step CFG diffusion render) audio-s/s per variant, interleaved REPS
times; prints per-variant medians and the audio seconds generated (equal
audio across variants confirms the levers didn't change what was
generated, only how fast).

Run: python scripts/ab_serving_pipeline.py    (holds the TPU; run alone)
Env: AB_B (default 16), AB_K (2), AB_MAX_GEN (300), AB_STEPS (50),
     AB_REPS (3), AB_VARIANTS (comma list of
     base|kvq|ladder|kvq_ladder|fused — fused needs B*K in {8,16}).
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

B = int(os.environ.get("AB_B", 16))
K = int(os.environ.get("AB_K", 2))
MAX_GEN = int(os.environ.get("AB_MAX_GEN", 300))
STEPS = int(os.environ.get("AB_STEPS", 50))
REPS = int(os.environ.get("AB_REPS", 3))
NAMES = os.environ.get("AB_VARIANTS", "base,kvq,ladder,kvq_ladder").split(",")

VARIANTS = {
    "base": dict(),
    "kvq": dict(kv_quant=True),
    "ladder": dict(cache_ladder=(128, 256)),
    "kvq_ladder": dict(kv_quant=True, cache_ladder=(128, 256)),
    "fused": dict(_fused=True),
    # sparse ReferenceNet hoist: render is 69% of the B=16 K=2 wave and
    # ReferenceNet recompute is its per-step overhead vs the (losing at
    # B=16) full hoist — k trades a bounded approximation for ~(k-1)/k of
    # that cost (TTSSettings.refnet_interval)
    "refnet3": dict(refnet_interval=3),
    "refnet5": dict(refnet_interval=5),
    "refnet5_kvq": dict(refnet_interval=5, kv_quant=True),
    # composition candidates at B*K in {8,16} where the fused kernel applies
    "fused_refnet5": dict(refnet_interval=5, _fused=True),
    # ladder (AR lever, 1.40x at B=16 K=2) x refnet5 (render lever) —
    # orthogonal stages, expected to compose where kvq_ladder didn't
    "refnet5_ladder": dict(refnet_interval=5, cache_ladder=(128, 256)),
    "refnet3_ladder": dict(refnet_interval=3, cache_ladder=(128, 256)),
    # the reference's own speed/quality dial: fewer spaced DPM++2M render
    # steps (its presets run 30-200 iters, ttts/api.py:276-281; the live
    # path runs 50, test.py:113-118). Renders stay CFG + rerank-exact at
    # the chosen step count; fidelity cost quantified by
    # scripts/quality_steps.py
    "steps30": dict(diffusion_steps=30),
    "steps20": dict(diffusion_steps=20),
    "steps30_ladder": dict(diffusion_steps=30, cache_ladder=(128, 256)),
    "steps20_ladder": dict(diffusion_steps=20, cache_ladder=(128, 256)),
}


def main():
    cfg_path = os.environ.get("AB_CONFIG", "")
    cfg = (XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig())
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True, with_clvp=True)
    # clamp for tiny CPU-smoke configs whose caps sit below the bench
    # inputs (text cap, CLIP patch capacity); no-ops on the real config
    tl = min(50, cfg.gpt.max_text_tokens - 4, cfg.clvp.text_seq_len - 4)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg, text_len=tl)
    tmax = cfg.diffusion.clip.max_patches * cfg.diffusion.clip.patch_size
    if cond_mel.shape[-1] > tmax:
        cond_mel = cond_mel[:, :, :tmax]
    sr = cfg.mel.sample_rate

    from xtts_tpu.infer.serving import SynthesisRequest, synthesize_batch
    reqs = [SynthesisRequest(text_tokens[0]) for _ in range(B)]

    def settings_for(name):
        kw = dict(VARIANTS[name])
        fused = kw.pop("_fused", False)
        kw.setdefault("diffusion_steps", STEPS)
        return TTSSettings(max_mel_tokens=MAX_GEN,
                           num_candidates=K, **kw), fused

    def run(name, key):
        s, fused = settings_for(name)
        old = os.environ.pop("XTTS_FUSED_SERVING", None)
        if fused:
            os.environ["XTTS_FUSED_SERVING"] = "1"
        try:
            wavs = synthesize_batch(tts, reqs, cond_mel, s,
                                    use_diffusion=True, key=key)
        finally:
            if old is not None:
                os.environ["XTTS_FUSED_SERVING"] = old
        return sum(w.size for w in wavs) / sr

    # compile pass per variant (not timed)
    for name in NAMES:
        t0 = time.perf_counter()
        run(name, jax.random.PRNGKey(99))
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f} s",
              flush=True)

    times = {n: [] for n in NAMES}
    audio = {n: [] for n in NAMES}
    for r in range(REPS):
        for name in NAMES:           # interleaved: drift hits all variants
            t0 = time.perf_counter()
            a = run(name, jax.random.PRNGKey(r))
            dt = time.perf_counter() - t0
            times[name].append(dt)
            audio[name].append(a)
    base_med = float(np.median(times[NAMES[0]]))
    for name in NAMES:
        med = float(np.median(times[name]))
        thr = float(np.median(audio[name])) / med
        print(f"{name}: median {med:6.2f} s  {thr:6.1f} audio-s/s  "
              f"({base_med / med:.3f}x vs {NAMES[0]}; "
              f"audio {np.median(audio[name]):.1f} s)", flush=True)


if __name__ == "__main__":
    main()
