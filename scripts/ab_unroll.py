"""Same-moment A/B: diffusion sampling-loop scan unroll (real TPU).

The round-3 profile (scripts/trace_diffusion.py) showed the flagship
denoise step is prefetch-scheduling-bound: ~1.8 ms/step of compute fusions
inside a ~3.7 ms/step loop iteration. `lax.scan(..., unroll=k)` gives XLA
k step bodies in one loop iteration to schedule against each other, which
can overlap step i+1's weight prefetch with step i's compute.

Times the FULL live render quantity — 50-step CFG p-loop with hoisted
ReferenceNet at the bucket-320 e2e shape (xtts_tpu/infer/api.py
:_diffusion_mel_impl) — for XTTS_SCAN_UNROLL in {1, 2, 4}, interleaved
A/B/A to cancel tunnel drift.

Run: python scripts/ab_unroll.py   (holds the TPU; run alone)
Env: AB_T_LAT (default 320 = the common e2e code bucket), AB_STEPS (50),
     AB_REPS (5), AB_UNROLLS (1,2,4).
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
REPS = int(os.environ.get("AB_REPS", 5))
UNROLLS = [int(u) for u in os.environ.get("AB_UNROLLS", "1,2,4").split(",")]


def main():
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TextToSpeech
    from xtts_tpu.models.aa_diffusion import normalize_tacotron_mel

    cfg = XTTSConfig()
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=False)
    rng = np.random.default_rng(0)   # render-only A/B: raw latents suffice
    latent = jnp.asarray(rng.standard_normal(
        (1, cfg.gpt.model_dim, T_LAT)).astype(np.float32)) * 0.1
    refer = jnp.asarray(rng.standard_normal(
        (1, cfg.mel.n_mels, 300)).astype(np.float32)) * 0.1
    cond = normalize_tacotron_mel(refer)
    key = jax.random.PRNGKey(0)

    def render(unroll):
        # Each variant needs a DISTINCT function object: pjit's global cache
        # keys on function identity + abstract args, so three jax.jit
        # wrappers of the same bound method all reuse the first executable
        # (observed: unroll=2/4 "compiled" in 0.2 s — a silent cache hit
        # that made the first A/B measure one program three times).
        def impl(dvars, lat, cm, k, temp):
            os.environ["XTTS_SCAN_UNROLL"] = str(unroll)   # read at trace
            return tts._diffusion_mel_impl(dvars, lat, cm, k, temp,
                                           steps=STEPS, sampler="p",
                                           cond_free_k=2.0)
        f = jax.jit(impl)
        def run():
            out = f(tts.vars["diffusion"], latent, cond, key,
                    jnp.float32(1.0))
            float(out.sum())        # host sync
        return run

    fns = {u: render(u) for u in UNROLLS}
    for u, f in fns.items():
        os.environ["XTTS_SCAN_UNROLL"] = str(u)
        t0 = time.perf_counter()
        f()
        print(f"unroll={u}: compile+run {time.perf_counter() - t0:.1f} s",
              flush=True)

    times = {u: [] for u in UNROLLS}
    for r in range(REPS):
        for u in UNROLLS:        # interleaved to cancel drift
            os.environ["XTTS_SCAN_UNROLL"] = str(u)
            t0 = time.perf_counter()
            fns[u]()
            times[u].append(time.perf_counter() - t0)
    base = np.median(times[UNROLLS[0]])
    for u in UNROLLS:
        med = np.median(times[u])
        print(f"unroll={u}: median {med * 1000:7.1f} ms "
              f"({med / STEPS * 1000:5.2f} ms/step, "
              f"{base / med:.3f}x vs unroll={UNROLLS[0]})", flush=True)


if __name__ == "__main__":
    main()
