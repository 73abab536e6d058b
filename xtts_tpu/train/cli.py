"""Training CLI — `python -m xtts_tpu.train.cli <model> -c cfg.json -m expdir`.

One entry point replaces the reference's five `accelerate launch
ttts/<model>/train_ms.py -c config -m exp` variants (README.md:33-53,
ttts/gpt/train_ms.py:273-295). Shared machinery: XTTSConfig JSON, bucketed
datasets, the generic pjit Trainer (grad accum, clip, schedule), orbax
checkpoints with rotation + exact resume, JSONL/TensorBoard metrics.

Examples:
  python -m xtts_tpu.train.cli vqvae -c cfg.json -m exp/vqvae \
      --filelist train.txt
  python -m xtts_tpu.train.cli gpt -c cfg.json -m exp/gpt \
      --filelist train.txt --dvae-weights exp/vqvae/best.npz
  python -m xtts_tpu.train.cli diffusion -c cfg.json -m exp/diff \
      --filelist train.txt --dvae-weights ... --gpt-weights ...
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import XTTSConfig


def build_dataset(model: str, cfg: XTTSConfig, filelist: str, tokenizer,
                  seed: int):
    from xtts_tpu.data.datasets import (CLVPDataset, DiffusionDataset,
                                        GptTTSDataset, MelCache,
                                        VQVAEMelDataset, read_filelist)
    from xtts_tpu.dsp.mel import MelFrontend
    entries = read_filelist(filelist)
    mel_cache = MelCache(MelFrontend(cfg.mel), cfg.mel.sample_rate)
    if model == "vqvae":
        return VQVAEMelDataset(entries, mel_cache, seed=seed)
    if model == "gpt":
        return GptTTSDataset(entries, mel_cache, tokenizer,
                             mel_hop=cfg.mel.hop_length, seed=seed)
    if model == "diffusion":
        return DiffusionDataset(entries, mel_cache, tokenizer,
                                mel_hop=cfg.mel.hop_length, seed=seed)
    if model == "clvp":
        return CLVPDataset(entries, tokenizer)
    raise ValueError(model)


def build_collate(model: str):
    from xtts_tpu.data.datasets import (MEL_BUCKETS, TEXT_BUCKETS,
                                        collate_bucketed)
    pads = {
        "vqvae": ({}, {}),
        "gpt": ({"text": 0, "mel": 1, "cond_mel": 1},
                {"text": TEXT_BUCKETS, "mel": MEL_BUCKETS,
                 "cond_mel": MEL_BUCKETS}),
        "diffusion": ({"text": 0, "mel": 1, "refer_mel": 1},
                      {"text": TEXT_BUCKETS, "mel": MEL_BUCKETS,
                       "refer_mel": MEL_BUCKETS}),
        "clvp": ({"text": 0, "codes": 0},
                 {"text": TEXT_BUCKETS, "codes": (128, 256, 430)}),
    }[model]
    return lambda samples: collate_bucketed(samples, pads[0], pads[1])


def adapt_batch(model: str, batch):
    """Collated numpy batch -> the field names each loss_fn expects."""
    if batch is None:
        return None
    if model == "gpt":
        return {"cond_mel": batch["cond_mel"], "text": batch["text"],
                "text_lengths": batch["text_length"], "mel": batch["mel"],
                "wav_lengths": batch["wav_length"]}
    if model == "diffusion":
        return {"mel": batch["mel"], "refer_mel": batch["refer_mel"],
                "text": batch["text"], "text_lengths": batch["text_length"],
                "wav_lengths": batch["wav_length"]}
    if model == "clvp":
        t = batch["text"]
        return {"text": t, "codes": batch["codes"],
                "text_mask": (np.arange(t.shape[1])[None]
                              < batch["text_length"][:, None]).astype(np.int32),
                "code_mask": (np.arange(batch["codes"].shape[1])[None]
                              < batch["codes_length"][:, None]).astype(np.int32)}
    return batch


def build_loss(model: str, cfg: XTTSConfig, args):
    """Returns (loss_fn, params, state_cols)."""
    from xtts_tpu.utils.registry import load_model
    if model == "vqvae":
        from xtts_tpu.train.steps import make_dvae_loss
        m, variables = load_model("vqvae", cfg)
        cols = {"codebook": dict(variables["codebook"])}
        return (make_dvae_loss(m, ema_decay=cfg.vqvae.ema_decay),
                variables["params"], cols)
    if model == "gpt":
        from xtts_tpu.train.steps import make_gpt_loss
        gpt, gv = load_model("gpt", cfg)
        dvae, dv = load_model("vqvae", cfg, weights_path=args.dvae_weights)
        return (make_gpt_loss(gpt, dvae, dv, cfg.train.text_weight,
                              cfg.train.mel_weight), gv["params"], {})
    if model == "diffusion":
        from xtts_tpu.diffusion.gaussian import (GaussianDiffusion,
                                                 get_named_beta_schedule)
        from xtts_tpu.train.steps import make_diffusion_loss
        diff, fv = load_model("diffusion", cfg)
        gpt, gv = load_model("gpt", cfg, weights_path=args.gpt_weights)
        dvae, dv = load_model("vqvae", cfg, weights_path=args.dvae_weights)
        gd = GaussianDiffusion(betas=get_named_beta_schedule(
            cfg.diffusion_process.schedule, cfg.diffusion_process.timesteps))
        return (make_diffusion_loss(
            diff, gd, gpt, gv, dvae, dv,
            cfg.diffusion.unconditioned_percentage), fv["params"], {})
    if model == "clvp":
        from xtts_tpu.models.clvp import make_clvp_loss
        m, variables = load_model("clvp", cfg)
        return make_clvp_loss(m), variables["params"], {}
    raise ValueError(model)


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", choices=["vqvae", "gpt", "diffusion", "clvp"])
    ap.add_argument("-c", "--config", default=None,
                    help="XTTSConfig JSON (defaults to shipped config)")
    ap.add_argument("-m", "--model-dir", required=True,
                    help="experiment dir (checkpoints + logs)")
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--dvae-weights", default=None)
    ap.add_argument("--gpt-weights", default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="override train.train_steps")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    cfg = XTTSConfig.from_json(args.config) if args.config else XTTSConfig()
    if args.steps is not None:
        cfg = cfg.replace(train=cfg.train.replace(train_steps=args.steps))

    from xtts_tpu.core.logging import MetricLogger, StepTimer, get_logger
    from xtts_tpu.data.datasets import batch_iterator
    from xtts_tpu.text.tokenizer import VoiceBpeTokenizer
    from xtts_tpu.train.trainer import Trainer

    os.makedirs(args.model_dir, exist_ok=True)
    logger = get_logger("xtts_tpu.cli",
                        os.path.join(args.model_dir, "train.log"))
    tok = VoiceBpeTokenizer(args.tokenizer)
    dataset = build_dataset(args.model, cfg, args.filelist, tok,
                            cfg.train.seed)
    logger.info("dataset: %d samples", len(dataset))

    loss_fn, params, cols = build_loss(args.model, cfg, args)
    trainer = Trainer(loss_fn, cfg.train, accum_steps=1,
                      checkpoint_dir=os.path.join(args.model_dir, "ckpt"))
    state = trainer.init_state(params, cols)
    if args.resume:
        state = trainer.restore(state)
        logger.info("resumed at step %d", int(state.step))

    ml = MetricLogger(os.path.join(args.model_dir, "logs"), console_every=10)
    timer = StepTimer()
    collate = build_collate(args.model)
    it = batch_iterator(dataset, cfg.train.batch_size, collate,
                        seed=cfg.train.seed)
    rng = jax.random.PRNGKey(cfg.train.seed)

    for batch in it:
        batch = adapt_batch(args.model, batch)
        if batch is None:
            continue
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.step(state, batch, sub)
        step = int(state.step)
        timer.tick()
        ml.scalars(step, {**metrics, "step_time": timer.mean})
        if step % cfg.train.save_freq == 0:
            trainer.save(state)
            logger.info("checkpoint @ %d", step)
        if step >= cfg.train.train_steps:
            break
    trainer.save(state, wait=True)
    ml.close()
    logger.info("done at step %d", int(state.step))


if __name__ == "__main__":
    main()
