"""Time the live render loop in an isolated process (real TPU).

Process-level A/B harness for anything that must be set before jax import
(XLA_FLAGS, platform knobs): each setting runs as its own process and
prints one line. Drift between processes is ~10% on this tunnel — run
A/B/A and trust only effects larger than the control runs' spread.

NOTE on XLA_FLAGS: TPU-tuning flags (e.g. --xla_tpu_scoped_vmem_limit_kib)
are UNKNOWN to the axon PJRT plugin and FATAL on import here (PERF.md
round 3) — on this platform the harness is only useful for generic
settings (JAX config env vars, cache dirs, XTTS_* knobs).

Usage:  AB_TAG=ctrl python scripts/ab_vmem.py
Env: AB_T_LAT (320), AB_STEPS (50), AB_REPS (7), AB_TAG (label).
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

T_LAT = int(os.environ.get("AB_T_LAT", 320))
STEPS = int(os.environ.get("AB_STEPS", 50))
REPS = int(os.environ.get("AB_REPS", 7))
TAG = os.environ.get("AB_TAG", os.environ.get("XLA_FLAGS", "default") or
                     "default")


def main():
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TextToSpeech
    from xtts_tpu.models.aa_diffusion import normalize_tacotron_mel

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=False)
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.standard_normal(
        (1, cfg.gpt.model_dim, T_LAT)).astype(np.float32)) * 0.1
    refer = jnp.asarray(rng.standard_normal(
        (1, cfg.mel.n_mels, 300)).astype(np.float32)) * 0.1
    cond = normalize_tacotron_mel(refer)
    key = jax.random.PRNGKey(0)

    f = jax.jit(tts._diffusion_mel_impl,
                static_argnames=("steps", "sampler", "cond_free_k"))

    def run():
        out = f(tts.vars["diffusion"], latent, cond, key, jnp.float32(1.0),
                steps=STEPS, sampler="p", cond_free_k=2.0)
        float(out.sum())

    t0 = time.perf_counter()
    run()
    print(f"[{TAG}] compile+run {time.perf_counter() - t0:.1f} s", flush=True)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"[{TAG}] median {med * 1000:7.1f} ms ({med / STEPS * 1000:5.2f} "
          f"ms/step, min {min(ts) * 1000:.1f})", flush=True)


if __name__ == "__main__":
    main()
