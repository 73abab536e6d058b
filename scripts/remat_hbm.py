"""Peak-HBM measurement for the diffusion trainer remat policies (real TPU).

Compiles + runs ONE diffusion training step at the reference's production
scale — batch 64, 400-frame target mels, 300-frame refer mels
(ttts/diffusion/train_ms.py batch/crop defaults, dataset.py:64-69) — for
each remat policy and reports the device peak memory. This is the
memory-headroom table VERDICT r2 #3 asks for (PERF.md).

The frozen GPT latent extraction runs inside the step like the reference
(train_ms.py:311-319), so peaks include the full production step.

Run: python scripts/remat_hbm.py  (holds the TPU; run alone)
Env: HBM_BS (64), HBM_FRAMES (400), HBM_POLICIES (none,dots,full),
     HBM_GPT_LAYERS (15).
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
from xtts_tpu.models.aa_diffusion import AADiffusion
from xtts_tpu.models.dvae import DVAE
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.train.steps import make_diffusion_loss

BS = int(os.environ.get("HBM_BS", 64))
FRAMES = int(os.environ.get("HBM_FRAMES", 400))
REFER = 300
POLICIES = os.environ.get("HBM_POLICIES", "none,dots,full").split(",")


def peak_mb():
    stats = jax.local_devices()[0].memory_stats()
    if stats is None:
        return float("nan")
    return stats.get("peak_bytes_in_use", 0) / (1 << 20)


def run_policy(policy: str):
    cfg = XTTSConfig()
    gpt_layers = int(os.environ.get("HBM_GPT_LAYERS", cfg.gpt.layers))
    cfg = cfg.replace(gpt=cfg.gpt.replace(layers=gpt_layers),
                      diffusion=cfg.diffusion.replace(remat=policy))
    dtype = jnp.bfloat16
    diff = AADiffusion(cfg.diffusion, dtype=dtype)
    gpt = UnifiedVoice(cfg.gpt, dtype=dtype)
    dvae = DVAE(cfg.vqvae, dtype=dtype)

    rng = np.random.default_rng(0)
    n_codes = FRAMES // cfg.vqvae.compression          # 100 latents
    mel = jnp.asarray(rng.standard_normal(
        (BS, cfg.mel.n_mels, FRAMES)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal(
        (BS, cfg.mel.n_mels, REFER)).astype(np.float32))
    text = jnp.asarray(rng.integers(2, 250, (BS, 64)).astype(np.int32))
    batch = {"mel": mel, "refer_mel": refer, "text": text,
             "text_lengths": jnp.full((BS,), 64, jnp.int32),
             "wav_lengths": jnp.full(
                 (BS,), (n_codes - 1) * cfg.gpt.mel_length_compression,
                 jnp.int32)}

    gv = jax.jit(gpt.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.mel.n_mels, 40)),
        jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 8), jnp.int32), jnp.array([8 * 1024]))
    dv = jax.jit(dvae.init)(jax.random.PRNGKey(2),
                            jnp.zeros((1, cfg.mel.n_mels, 32)))
    fv = jax.jit(diff.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, cfg.diffusion.in_channels, 16)),
        jnp.array([0]), jnp.zeros((1, cfg.diffusion.in_latent_channels, 4)),
        jnp.zeros((1, cfg.diffusion.in_channels, 16)))

    gd = GaussianDiffusion(betas=get_named_beta_schedule(
        cfg.diffusion_process.schedule, cfg.diffusion_process.timesteps))
    loss_fn = make_diffusion_loss(diff, gd, gpt, gv, dvae, dv)

    @jax.jit
    def step(params, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, {}, batch, key)
        gn = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
            grads, 0.0)
        return loss, jnp.sqrt(gn)

    try:
        loss, gn = step(fv["params"], batch, jax.random.PRNGKey(0))
        loss = float(loss)
        ok = np.isfinite(loss)
        print(f"remat={policy:13s} bs={BS} frames={FRAMES}: "
              f"loss={loss:.4f} grad_norm={float(gn):.3f} "
              f"peak_hbm={peak_mb():.0f} MiB {'OK' if ok else 'NONFINITE'}",
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
