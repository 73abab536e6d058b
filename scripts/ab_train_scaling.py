"""Same-PROCESS A/B of trainer-step batch scaling (any family).

Round-4 origin: cross-process singles said GPT bs32 runs at 0.57x the
samples/s of bs8 — implausible; interleaving the batch sizes in one
process strips the chip-moment drift (PERF.md phase 11: bs8/bs32 FLAT,
the step saturates at bs8). Round 5 extends it to the families whose
round-4 table rows claimed "latency-bound, scales with bs" without a
probe (vqvae, classifier — VERDICT r4 weak #5).

Run: python scripts/ab_train_scaling.py   (holds the TPU; run alone)
Env: AB_BS (default "8,32"), AB_STEPS (10), AB_REPS (3), AB_FAMILY
     (gpt|vqvae|classifier|clvp|diffusion; batch shapes mirror bench.py).
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
from xtts_tpu.train.trainer import Trainer

BSS = [int(b) for b in os.environ.get("AB_BS", "8,32").split(",")]
STEPS = int(os.environ.get("AB_STEPS", 10))
REPS = int(os.environ.get("AB_REPS", 3))
FAMILY = os.environ.get("AB_FAMILY", "gpt")


def main():
    cfg_path = os.environ.get("AB_CONFIG", "")
    cfg0 = XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    bins = cfg0.mel.n_mels
    arms = {}
    for bs in BSS:
        cfg = cfg0.replace(train=cfg0.train.replace(
            accum_grad=1, batch_size=bs, remat="none", warmup_steps=10))
        args = types.SimpleNamespace(dvae_weights=None, gpt_weights=None)
        loss_fn, params, cols, _ = build_loss(FAMILY, cfg, args)
        # clamp the synthetic shapes to tiny-config capacities (no-ops on
        # the real config; the trainer's capacity guard raises otherwise)
        tlen = min(150, cfg.gpt.max_text_tokens - 4)
        vmax = min(250, cfg.gpt.number_text_tokens - 2)
        mlen = min(800, (cfg.gpt.max_mel_tokens - 4) * 4)
        text = jnp.asarray(rng.integers(3, vmax, (bs, tlen)).astype(np.int32))
        mel = lambda f, b=bs: jnp.asarray(
            rng.standard_normal((b, bins, f)).astype(np.float32) * 0.1)
        if FAMILY == "gpt":
            batch = {"cond_mel": mel(min(400, mlen)), "text": text,
                     "text_lengths": jnp.full((bs,), tlen, jnp.int32),
                     "mel": mel(mlen),
                     "wav_lengths": jnp.full((bs,), mlen * cfg.mel.hop_length,
                                             jnp.int32)}
        elif FAMILY == "vqvae":
            batch = {"mel": mel(min(200, mlen))}
        elif FAMILY == "classifier":
            spec = jnp.asarray(rng.standard_normal(
                (bs, 400, cfg.classifier.spec_dim)).astype(np.float32) * 0.1)
            batch = {"mel": spec, "label": jnp.asarray(
                rng.integers(0, 2, (bs,)).astype(np.int32))}
        elif FAMILY == "clvp":
            cl = min(250, cfg.clvp.speech_seq_len - 2)
            batch = {"text": text[:, :min(120, cfg.clvp.text_seq_len - 2)],
                     "codes": jnp.asarray(
                         rng.integers(0, min(8192, cfg.vqvae.num_tokens),
                                      (bs, cl)).astype(np.int32))}
        elif FAMILY == "diffusion":
            dlen = min(400, mlen)
            batch = {"mel": mel(dlen), "refer_mel": mel(min(304, dlen)),
                     "text": text, "text_lengths":
                         jnp.full((bs,), tlen, jnp.int32),
                     "wav_lengths": jnp.full((bs,), dlen * cfg.mel.hop_length,
                                             jnp.int32)}
        else:
            raise SystemExit(f"AB_FAMILY={FAMILY!r} unsupported")
        trainer = Trainer(loss_fn, cfg.train)
        state = trainer.init_state(params, cols or None)
        arms[bs] = [trainer, state, batch]

    key = jax.random.PRNGKey(0)
    for bs, arm in arms.items():
        t0 = time.perf_counter()
        arm[1], m = arm[0].step(arm[1], arm[2], key)
        float(m["loss"])
        print(f"bs{bs}: compile+run {time.perf_counter() - t0:.1f} s",
              flush=True)

    times = {bs: [] for bs in BSS}
    for r in range(REPS):
        for bs, arm in arms.items():
            t0 = time.perf_counter()
            for i in range(STEPS):
                arm[1], m = arm[0].step(arm[1], arm[2],
                                        jax.random.fold_in(key, r * 100 + i))
            float(m["loss"])
            times[bs].append(time.perf_counter() - t0)
    for bs in BSS:
        med = float(np.median(times[bs]))
        print(f"bs{bs}: median {med:6.2f} s for {STEPS} steps -> "
              f"{STEPS * bs / med:7.2f} samples/s  "
              f"({med / STEPS * 1e3:6.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
