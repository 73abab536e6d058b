"""Peak-HBM measurement for the diffusion trainer remat policies (real TPU).

Compiles + runs ONE diffusion training step at the reference's production
scale — batch 64, 400-frame target mels, 300-frame refer mels
(ttts/diffusion/train_ms.py batch/crop defaults, dataset.py:64-69) — for
each remat policy and reports the device peak memory. This is the
memory-headroom table VERDICT r2 #3 asks for (PERF.md).

The frozen GPT latent extraction (train_ms.py:311-319) is replaced by
random latents of the production shape: it runs under stop_gradient, so
its activation memory is remat-policy-independent, and skipping it keeps
the bs-64 compile tractable on this 1-core host (see comment below).

Run: python scripts/remat_hbm.py  (holds the TPU; run alone)
Env: HBM_BS (64), HBM_FRAMES (400), HBM_POLICIES (none,dots,full).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.diffusion.gaussian import (GaussianDiffusion,
                                         get_named_beta_schedule)
from xtts_tpu.models.aa_diffusion import AADiffusion, normalize_tacotron_mel

BS = int(os.environ.get("HBM_BS", 64))
FRAMES = int(os.environ.get("HBM_FRAMES", 400))
REFER = 300
POLICIES = os.environ.get("HBM_POLICIES", "none,dots,full").split(",")


def peak_mb():
    stats = jax.local_devices()[0].memory_stats()
    if stats is None:
        return float("nan")
    return stats.get("peak_bytes_in_use", 0) / (1 << 20)


def mem_analysis_mb(compiled):
    """XLA's own buffer-assignment numbers (exact, deterministic). The
    axon/tunnel platform returns no runtime memory_stats, so the table
    reports the compiler's planned HBM: temp (activations + workspace —
    the quantity remat trades for FLOPs) and argument/output sizes."""
    try:
        ma = compiled.memory_analysis()
        return {"temp": ma.temp_size_in_bytes / (1 << 20),
                "args": ma.argument_size_in_bytes / (1 << 20),
                "out": ma.output_size_in_bytes / (1 << 20)}
    except Exception:
        return None


def run_policy(policy: str):
    cfg = XTTSConfig()
    cfg = cfg.replace(diffusion=cfg.diffusion.replace(remat=policy))
    dtype = jnp.bfloat16
    diff = AADiffusion(cfg.diffusion, dtype=dtype)

    # The frozen GPT latent pass (ttts/diffusion/train_ms.py:311-319) runs
    # under stop_gradient: its activation memory is remat-policy-INDEPENDENT
    # and its 15-layer bs-64 graph takes >30 min to compile on this 1-core
    # host, so the table feeds random latents of the production shape
    # directly — it isolates exactly the quantity remat changes (the UNet
    # fwd+bwd activation footprint).
    rng = np.random.default_rng(0)
    n_codes = FRAMES // cfg.vqvae.compression          # 100 latents
    x_start = jnp.asarray(rng.standard_normal(
        (BS, cfg.mel.n_mels, FRAMES)).astype(np.float32)) * 0.1
    refer = jnp.asarray(rng.standard_normal(
        (BS, cfg.mel.n_mels, REFER)).astype(np.float32)) * 0.1
    latent = jnp.asarray(rng.standard_normal(
        (BS, cfg.diffusion.in_latent_channels, n_codes)).astype(np.float32))

    fv = jax.jit(diff.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, cfg.diffusion.in_channels, 16)),
        jnp.array([0]), jnp.zeros((1, cfg.diffusion.in_latent_channels, 4)),
        jnp.zeros((1, cfg.diffusion.in_channels, 16)))

    gd = GaussianDiffusion(betas=get_named_beta_schedule(
        cfg.diffusion_process.schedule, cfg.diffusion_process.timesteps))

    def loss_fn(params, key):
        r_t, r_noise, r_uc = jax.random.split(key, 3)
        t = jax.random.randint(r_t, (BS,), 0, gd.num_timesteps)
        uncond = jax.random.uniform(r_uc, (BS,)) < 0.1

        def model_fn(x_t, t_orig):
            return diff.apply({"params": params}, x_t, t_orig, latent,
                              normalize_tacotron_mel(refer),
                              uncond_mask=uncond)

        terms = gd.training_losses(model_fn, normalize_tacotron_mel(x_start),
                                   t, r_noise)
        return terms["loss"].mean()

    @jax.jit
    def step(params, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        gn = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
            grads, 0.0)
        return loss, jnp.sqrt(gn)

    try:
        compiled = step.lower(fv["params"], jax.random.PRNGKey(0)).compile()
        ma = mem_analysis_mb(compiled)
        loss, gn = compiled(fv["params"], jax.random.PRNGKey(0))
        loss = float(loss)
        ok = np.isfinite(loss)
        mem = (f"temp={ma['temp']:.0f} MiB args={ma['args']:.0f} MiB"
               if ma else f"peak_hbm={peak_mb():.0f} MiB")
        print(f"remat={policy:13s} bs={BS} frames={FRAMES}: "
              f"loss={loss:.4f} grad_norm={float(gn):.3f} "
              f"{mem} {'OK' if ok else 'NONFINITE'}",
              flush=True)
    except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED -> OOM
        msg = str(e).splitlines()[0][:140]
        print(f"remat={policy:13s} bs={BS} frames={FRAMES}: FAILED ({msg})",
              flush=True)


def main():
    if len(POLICIES) > 1:
        # peak_bytes_in_use is cumulative per process — one subprocess per
        # policy keeps the peaks independent
        import subprocess
        for p in POLICIES:
            env = dict(os.environ, HBM_POLICIES=p.strip())
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, check=False)
        return
    run_policy(POLICIES[0].strip())


if __name__ == "__main__":
    main()
