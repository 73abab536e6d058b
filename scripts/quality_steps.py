"""Quantify the diffusion step-count dial's render divergence at real scale.

The reference's own speed/quality dial is fewer sampler iterations: its
presets run 30/80/200/400 (ttts/api.py:276-281) while the live path runs
50-step DPM++2M + CFG (test.py:113-118). This measures what dropping the
serving render from 50 to QS_STEPS steps does to the OUTPUT at the real
model config: same AR codes (same key, AR settings identical), only the
render's spaced-timestep grid differs, so the wav/mel deltas are pure
solver-truncation effect.

Caveat (same as quality_refnet.py): random-initialized weights bound the
mechanism's numeric drift, not perceptual quality of a trained model —
step-count truncation error depends on the learned score field's
smoothness in t. The LDM zero-init output projections are filled with
small noise first, otherwise every variant renders bitwise-identical
silence.

Run: python scripts/quality_steps.py   (holds the TPU; run alone)
Env: QS_STEPS (default "30,20"), QS_BASE (50), QS_MAX_GEN (300), QS_CONFIG.
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

STEPS_LIST = [int(k) for k in os.environ.get("QS_STEPS", "30,20").split(",")]
BASE_STEPS = int(os.environ.get("QS_BASE", 50))
MAX_GEN = int(os.environ.get("QS_MAX_GEN", 300))


def main():
    cfg_path = os.environ.get("QS_CONFIG", "")
    cfg = XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    # fill LDM zero-init projections (see quality_refnet.py)
    kz = [jax.random.PRNGKey(1234)]

    def _unzero(p):
        if p.ndim >= 1 and p.size and not np.any(np.asarray(p)):
            kz[0], sub = jax.random.split(kz[0])
            return 0.02 * jax.random.normal(sub, p.shape, p.dtype)
        return p

    tts.vars["diffusion"] = jax.tree_util.tree_map(_unzero,
                                                   tts.vars["diffusion"])
    tl = min(50, cfg.gpt.max_text_tokens - 4)
    cond_mel, text_tokens = synthetic_inputs(tts, cfg, text_len=tl)
    tmax = cfg.diffusion.clip.max_patches * cfg.diffusion.clip.patch_size
    if cond_mel.shape[-1] > tmax:
        cond_mel = cond_mel[:, :, :tmax]

    key = jax.random.PRNGKey(7)

    def render(steps):
        s = TTSSettings(max_mel_tokens=MAX_GEN, diffusion_steps=steps)
        t0 = time.perf_counter()
        out = tts.tts_tokens(text_tokens, cond_mel, key, s,
                             use_diffusion=True, return_intermediates=True)
        dt = time.perf_counter() - t0
        return out, dt

    base, dt1 = render(BASE_STEPS)
    wav1 = np.asarray(base["wav"], np.float64)
    mel1 = np.asarray(base["mel"], np.float64)
    print(f"steps={BASE_STEPS} (reference live path): wav {wav1.shape} "
          f"rms {np.sqrt((wav1**2).mean()):.4f}  mel {mel1.shape}"
          f"  ({dt1:.1f} s)", flush=True)

    for steps in STEPS_LIST:
        out, dt = render(steps)
        wavk = np.asarray(out["wav"], np.float64)
        melk = np.asarray(out["mel"], np.float64)
        n = min(wav1.size, wavk.size)
        dw = wavk.reshape(-1)[:n] - wav1.reshape(-1)[:n]
        rel_wav = np.linalg.norm(dw) / max(
            np.linalg.norm(wav1.reshape(-1)[:n]), 1e-12)
        dm = melk - mel1
        rel_mel = np.linalg.norm(dm) / max(np.linalg.norm(mel1), 1e-12)
        print(f"steps={steps}: wav relL2 {rel_wav:.4f}  "
              f"max|dwav| {np.abs(dw).max():.4f}  mel relL2 {rel_mel:.4f}"
              f"  mel L1 {np.abs(dm).mean():.4f}  ({dt:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
