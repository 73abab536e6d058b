"""On-chip A/B: flash vs einsum attention in the denoise step (phase 17).

Same-process interleaved timing (the cross-process drift lesson, PERF.md
round 4) of the CFG denoise scan at serving shapes, einsum arm
(XTTS_FLASH_ATTN=0 at trace) vs flash arm (auto). Each arm is a DISTINCT
closure — N jit wrappers of the same callable share one executable and
would silently measure one program twice (verify-skill gotcha). Also
reports output relL2 between arms (expected ULP-level: exact math,
different summation order) and the flash arm's grad health (train path).

Run: python scripts/ab_flash_attn.py   (holds the TPU; run alone)
Env: AB_B (16), AB_T_LAT (300), AB_STEPS (10), AB_REPS (5).
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

from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.models.aa_diffusion import AADiffusion

B = int(os.environ.get("AB_B", 16))
T_LAT = int(os.environ.get("AB_T_LAT", 300))
N = int(os.environ.get("AB_STEPS", 10))
REPS = int(os.environ.get("AB_REPS", 5))
cfg = XTTSConfig().diffusion


def main():
    model = AADiffusion(cfg, dtype=jnp.bfloat16, flash=True)  # env arms toggle
    rng = np.random.default_rng(0)
    out_len = T_LAT * 4
    x = jnp.asarray(rng.standard_normal(
        (B, cfg.in_channels, out_len)).astype(np.float32))
    hint = jnp.asarray(rng.standard_normal(
        (B, cfg.in_latent_channels, out_len)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal(
        (B, cfg.in_channels, 300)).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, hint, refer)
    ctx = jax.jit(lambda v, r: model.apply(v, r, method=model.encode_reference)
                  )(variables, refer)
    control = jax.jit(lambda v, r, tt, c: model.apply(
        v, r, tt, c, method=model.reference_features))(variables, refer, t, ctx)

    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    h2 = jnp.concatenate([hint, hint], 0)
    c2 = jnp.concatenate([ctx, ctx], 0)
    ctrl2 = [jnp.concatenate([ci, ci], 0) for ci in control]

    def scan_denoise(v, xx):
        def body(carry, i):
            out = model.apply(v, carry, t2 + i, h2, c2, ctrl2,
                              method=model.denoise)
            return carry + 1e-6 * out[:, :cfg.in_channels], i
        y, _ = jax.lax.scan(body, xx, jnp.arange(N))
        return y

    # trace-time env gate -> trace each arm under its own env setting,
    # with a DISTINCT def per arm
    os.environ["XTTS_FLASH_ATTN"] = "0"

    def einsum_arm(v, xx):
        return scan_denoise(v, xx)
    f_einsum = jax.jit(einsum_arm)
    t0 = time.time()
    y_e = f_einsum(variables, x2)
    float(y_e.sum())
    print(f"einsum arm compiled+ran in {time.time()-t0:.1f}s", flush=True)

    os.environ["XTTS_FLASH_ATTN"] = "auto"

    def flash_arm(v, xx):
        return scan_denoise(v, xx)
    f_flash = jax.jit(flash_arm)
    t0 = time.time()
    y_f = f_flash(variables, x2)
    float(y_f.sum())
    print(f"flash  arm compiled+ran in {time.time()-t0:.1f}s", flush=True)

    rel = float(jnp.linalg.norm((y_f - y_e).astype(jnp.float32))
                / (jnp.linalg.norm(y_e.astype(jnp.float32)) + 1e-9))
    print(f"output relL2 flash vs einsum: {rel:.3e} (expect ~1e-3 bf16 ULP)",
          flush=True)

    # single-step grad through the flash kernel's custom VJP (train path)
    def gloss(v):
        out = model.apply(v, x2, t2, h2, c2, ctrl2, method=model.denoise)
        return jnp.sum((out.astype(jnp.float32)) ** 2) * 1e-9
    gn = jax.jit(lambda v: jax.grad(
        lambda p: gloss({**v, "params": p}))(v["params"]))(variables)
    gnorm = float(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                      for g in jax.tree_util.tree_leaves(gn)) ** 0.5)
    print(f"flash-arm grad norm finite: {np.isfinite(gnorm)} ({gnorm:.3e})",
          flush=True)

    arms = {"einsum": f_einsum, "flash": f_flash}
    times = {k: [] for k in arms}
    for r in range(REPS):
        for name, f in arms.items():
            t0 = time.perf_counter()
            y = f(variables, x2)
            float(y.sum())
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2] / N * 1000
        print(f"{name:7s} median {med:7.2f} ms/step over {REPS} reps",
              flush=True)
    med_e = sorted(times["einsum"])[REPS // 2]
    med_f = sorted(times["flash"])[REPS // 2]
    print(f"speedup einsum/flash: {med_e / med_f:.3f}x", flush=True)


if __name__ == "__main__":
    main()
