"""Quantify the refnet_interval approximation at real scale.

TTSSettings.refnet_interval=k caches ReferenceNet cross-attention features
at every k-th spaced diffusion timestep and reuses the floor-nearest cached
set in between (k=1 is exact reference semantics — ReferenceNet re-run per
step, /root/reference/ttts/diffusion/aa_model.py:275-339). This measures
what that approximation does to the RENDER OUTPUT at the real model config:
same AR codes (same key), only the render differs, so the wav/mel deltas
below are pure refnet_interval effect.

Caveat: random-initialized weights — the numbers bound the mechanism's
numeric drift (feature reuse across adjacent timesteps), not perceptual
quality of a trained model. A trained ReferenceNet's features vary MORE
smoothly in t than random ones (its timestep embedding is a low-frequency
learned code), so random weights are, if anything, the harder case for
feature-reuse drift on this axis.

Run: python scripts/quality_refnet.py   (holds the TPU; run alone)
Env: QR_KS (default "3,5"), QR_STEPS (50), QR_MAX_GEN (300), QR_CONFIG.
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

KS = [int(k) for k in os.environ.get("QR_KS", "3,5").split(",")]
STEPS = int(os.environ.get("QR_STEPS", 50))
MAX_GEN = int(os.environ.get("QR_MAX_GEN", 300))


def main():
    cfg_path = os.environ.get("QR_CONFIG", "")
    cfg = XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=True)
    # The UNet/ReferenceNet use LDM zero-init output projections, so at
    # random init every transformer block (incl. the refer cross-attention)
    # contributes exactly zero and k=1 vs k>1 would compare as bitwise
    # equal. Fill the all-zero kernels with small noise so the refer
    # features actually reach the output.
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

    def render(k):
        s = TTSSettings(max_mel_tokens=MAX_GEN, diffusion_steps=STEPS,
                        refnet_interval=k)
        t0 = time.perf_counter()
        out = tts.tts_tokens(text_tokens, cond_mel, key, s,
                             use_diffusion=True, return_intermediates=True)
        dt = time.perf_counter() - t0
        return out, dt

    base, dt1 = render(1)
    wav1 = np.asarray(base["wav"], np.float64)
    mel1 = np.asarray(base["mel"], np.float64)
    print(f"k=1 (exact): wav {wav1.shape} rms {np.sqrt((wav1**2).mean()):.4f}"
          f"  mel {mel1.shape}  ({dt1:.1f} s)", flush=True)

    for k in KS:
        out, dt = render(k)
        wavk = np.asarray(out["wav"], np.float64)
        melk = np.asarray(out["mel"], np.float64)
        n = min(wav1.size, wavk.size)
        dw = wavk.reshape(-1)[:n] - wav1.reshape(-1)[:n]
        rel_wav = np.linalg.norm(dw) / max(np.linalg.norm(wav1.reshape(-1)[:n]),
                                           1e-12)
        dm = melk - mel1
        rel_mel = np.linalg.norm(dm) / max(np.linalg.norm(mel1), 1e-12)
        print(f"k={k}: wav relL2 {rel_wav:.4f}  max|dwav| {np.abs(dw).max():.4f}"
              f"  mel relL2 {rel_mel:.4f}  mel L1 {np.abs(dm).mean():.4f}"
              f"  ({dt:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
