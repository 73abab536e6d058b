"""Same-process A/B: diffusion train step, fused vs split-frozen (phase 16).

The phase-16 split(96.1)-vs-fused(81.3) samples/s numbers were
cross-process singles on a drifty tunnel; this interleaves both modes in
ONE process (REPS alternating) so the chip-state cancels, settling which
is the honest default. Both modes share the SAME trainer/loss build;
the split arm precomputes batch['latent'] with the standalone jitted
latent program per step (exactly bench.py's BENCH_SPLIT_FROZEN path).

Run: python scripts/ab_split_fused.py   (holds the TPU; run alone)
Env: AB_BS (16), AB_STEPS (10), AB_REPS (5).
"""
import os
import sys
import time
import types

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.train.cli import build_loss
from xtts_tpu.train.steps import diffusion_latent_fn
from xtts_tpu.train.trainer import Trainer

BS = int(os.environ.get("AB_BS", 16))
STEPS = int(os.environ.get("AB_STEPS", 10))
REPS = int(os.environ.get("AB_REPS", 5))


def main():
    cfg = XTTSConfig()
    cfg = cfg.replace(train=cfg.train.replace(
        accum_grad=1, batch_size=BS, remat="none", warmup_steps=10))
    args = types.SimpleNamespace(dvae_weights=None, gpt_weights=None)
    loss_fn, params, cols, ctx = build_loss("diffusion", cfg, args)
    trainer = Trainer(loss_fn, cfg.train,
                      frozen=getattr(loss_fn, "frozen", None))
    state = trainer.init_state(params, cols or None)

    rng = np.random.default_rng(0)
    bins = cfg.mel.n_mels
    mel = lambda f: jnp.asarray(
        rng.standard_normal((BS, bins, f)).astype(np.float32) * 0.1)
    batch = {"mel": mel(800), "refer_mel": mel(400),
             "text": jnp.asarray(
                 rng.integers(3, 250, (BS, 150)).astype(np.int32)),
             "text_lengths": jnp.full((BS,), 150, jnp.int32),
             "wav_lengths": jnp.full((BS,), 800 * 256, jnp.int32)}

    latent_fn = diffusion_latent_fn(ctx["gpt"], ctx["gpt_vars"],
                                    ctx["dvae"], ctx["dvae_vars"])
    key = jax.random.PRNGKey(0)

    # compile both arms (state is donated — keep a fresh copy per call)
    import copy
    t0 = time.time()
    st = jax.tree_util.tree_map(jnp.array, state)
    st, m = trainer.step(st, batch, key)
    float(m["loss"])
    print(f"fused compiled+ran {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    lat = latent_fn(batch)
    st, m = trainer.step(st, {**batch, "latent": lat}, key)
    float(m["loss"])
    print(f"split compiled+ran {time.time()-t0:.1f}s", flush=True)

    times = {"fused": [], "split": []}
    for r in range(REPS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            st, m = trainer.step(st, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        times["fused"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for i in range(STEPS):
            b2 = {**batch, "latent": latent_fn(batch)}
            st, m = trainer.step(st, b2, jax.random.fold_in(key, i))
        float(m["loss"])
        times["split"].append(time.perf_counter() - t0)
        print(f"rep {r}: fused {times['fused'][-1]:.2f}s "
              f"split {times['split'][-1]:.2f}s", flush=True)
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med/STEPS*1000:.1f} ms/step "
              f"({BS*STEPS/med:.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
