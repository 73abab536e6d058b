"""Exact per-step FLOP counts for every trainer family at bench shapes.

XLA's cost model via `jax.jit(step).lower(...).cost_analysis()` — no
compile, no param materialization (abstract ShapeDtypeStruct operands), so
this runs on CPU in minutes and never touches the chip. Combine with the
measured ms/step (PERF.md trainer table) for MFU = flops / (t * 197e12)
on v5e (bf16 peak 197 TFLOP/s) — the VERDICT r4 #5 "MFU note per family".

Run: JAX_PLATFORMS=cpu python scripts/train_flops.py [families...]
Env: FLOPS_BS_<FAMILY> batch override (defaults mirror bench.py).
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from xtts_tpu.core.config import XTTSConfig


def abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def lower_family(family, cfg):
    """Lower one Trainer/GANTrainer step abstractly; return cost dict."""
    from xtts_tpu.train.cli import build_loss
    from xtts_tpu.train.trainer import Trainer

    bs = int(os.environ.get(f"FLOPS_BS_{family.upper()}",
                            {"gpt": 8, "vqvae": 64, "clvp": 64,
                             "classifier": 64, "diffusion": 16,
                             "hifigan": 8}[family]))
    rng = np.random.default_rng(0)
    bins = cfg.mel.n_mels
    mel = lambda f, b=bs: jnp.zeros((b, bins, f), jnp.float32)
    text = jnp.zeros((bs, 150), jnp.int32)
    tl = jnp.full((bs,), 150, jnp.int32)

    if family == "hifigan":
        from xtts_tpu.train.cli import build_gan_trainer
        gan, state, gen_fn = build_gan_trainer(cfg)
        wav_len = int(2.0 * cfg.mel.sample_rate) // 256 * 256
        frames = wav_len // cfg.mel.hop_length
        batch = {"wav": jnp.zeros((bs, wav_len)), "mel": mel(frames),
                 "refer_mel16": jnp.zeros((bs, 300, 64)),
                 "wav_length": jnp.full((bs,), wav_len, jnp.int32)}
        lowered = jax.jit(gan._train_step, donate_argnums=(0,)).lower(
            abstract(state), abstract(batch),
            jax.ShapeDtypeStruct((2,), jnp.uint32), abstract(gan.frozen))
        return bs, lowered.cost_analysis()

    args = types.SimpleNamespace(dvae_weights=None, gpt_weights=None)
    loss_fn, params, cols, _ = build_loss(family, cfg, args)
    trainer = Trainer(loss_fn, cfg.train.replace(accum_grad=1, remat="none"),
                      frozen=getattr(loss_fn, "frozen", None))
    state = trainer.init_state(params, cols or None)
    if family == "gpt":
        batch = {"cond_mel": mel(400), "text": text, "text_lengths": tl,
                 "mel": mel(800),
                 "wav_lengths": jnp.full((bs,), 800 * 256, jnp.int32)}
    elif family == "diffusion":
        batch = {"mel": mel(800), "refer_mel": mel(400), "text": text,
                 "text_lengths": tl,
                 "wav_lengths": jnp.full((bs,), 800 * 256, jnp.int32)}
    elif family == "vqvae":
        batch = {"mel": mel(200)}
    elif family == "clvp":
        batch = {"text": jnp.zeros((bs, 120), jnp.int32),
                 "codes": jnp.zeros((bs, 250), jnp.int32)}
    else:
        batch = {"mel": jnp.zeros((bs, 400, bins)),
                 "label": jnp.zeros((bs,), jnp.int32)}
    lowered = jax.jit(trainer._train_step, donate_argnums=(0,)).lower(
        abstract(state), abstract(batch),
        jax.ShapeDtypeStruct((2,), jnp.uint32), abstract(trainer.frozen))
    return bs, lowered.cost_analysis()


def main():
    cfg = XTTSConfig()
    fams = sys.argv[1:] or ["gpt", "vqvae", "clvp", "classifier",
                            "diffusion", "hifigan"]
    for fam in fams:
        try:
            bs, cost = lower_family(fam, cfg)
            fl = cost.get("flops", float("nan"))
            ba = cost.get("bytes accessed", float("nan"))
            print(f"{fam}: bs={bs} flops/step={fl:.3e} "
                  f"({fl/1e12:.2f} TFLOP) bytes={ba:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{fam}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
