"""Training CLI — `python -m xtts_tpu.train.cli <model> -c cfg.json -m expdir`.

One entry point replaces the reference's five `accelerate launch
ttts/<model>/train_ms.py -c config -m exp` variants (README.md:33-53,
ttts/gpt/train_ms.py:273-295). Shared machinery: XTTSConfig JSON, bucketed
datasets, the generic pjit Trainer (grad accum, clip, schedule), orbax
checkpoints with rotation + exact resume, JSONL/TensorBoard metrics.

At the end of training each family also exports `<expdir>/<family>.npz`
(final weights + non-gradient collections, e.g. the DVAE codebook), which
is what the downstream stages and TextToSpeech.from_pretrained consume —
the ttts/train_step.py:1-6 recipe chains as:

  python -m xtts_tpu.train.cli vqvae -c cfg.json -m exp/vqvae \
      --filelist train.txt
  python -m xtts_tpu.train.cli gpt -c cfg.json -m exp/gpt \
      --filelist train.txt --dvae-weights exp/vqvae/vqvae.npz
  python -m xtts_tpu.train.cli diffusion -c cfg.json -m exp/diff \
      --filelist train.txt --dvae-weights exp/vqvae/vqvae.npz \
      --gpt-weights exp/gpt/gpt.npz
  # then collect exp/*/<family>.npz into one model dir for from_pretrained
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
                  seed: int, noise_filelist: str = None):
    from xtts_tpu.data.datasets import (ClassifierDataset, CLVPDataset,
                                        DiffusionDataset, GptTTSDataset,
                                        MelCache, VQVAEMelDataset,
                                        read_filelist)
    from xtts_tpu.dsp.mel import MelFrontend
    mel_cache = MelCache(MelFrontend(cfg.mel), cfg.mel.sample_rate)
    if model == "classifier":
        # clean/noise are plain wav-path lists (ttts/classifier/config.json
        # dataset.clean / dataset.noise)
        def paths(p):
            with open(p) as f:
                return [ln.strip() for ln in f if ln.strip()]
        return ClassifierDataset(paths(filelist), paths(noise_filelist),
                                 mel_cache, seed=seed)
    entries = read_filelist(filelist)
    if model == "vqvae":
        return VQVAEMelDataset(entries, mel_cache, seed=seed)
    # Token-id range check: a tokenizer whose vocab exceeds the model's
    # text-embedding size (e.g. a vocab-2048 retrain, voice_tokenizer.py:97,
    # against the shipped number_text_tokens=256) would gather OOB — silent
    # NaNs under jit, so refuse up front.
    # (for GPT the usable range ends at the reserved start_text_token,
    # matching the shipped vocab-255 / number_text_tokens-256 split)
    cap = (cfg.clvp.num_text_tokens if model == "clvp"
           else cfg.gpt.start_text_token)
    # VoiceBpeTokenizer.vocab_size is a property; duck-typed tokenizers
    # (HF tokenizers' own Tokenizer) may expose a method — accept both
    vocab = tokenizer.vocab_size
    vocab = vocab() if callable(vocab) else vocab
    if vocab > cap:
        raise ValueError(
            f"tokenizer vocab {vocab} exceeds the "
            f"{'CLVP text-embedding size' if model == 'clvp' else 'GPT id range (start_text_token)'} "
            f"{cap} — ids past it would gather OOB (silent NaNs under jit) "
            f"or collide with reserved specials. Retrain the tokenizer "
            f"smaller or raise the config.")
    # Reject limits follow the reference defaults (text>300 / mel>2000,
    # ttts/gpt/dataset.py:72-74) but never exceed what the MODEL's learned
    # position tables can hold — a sample past those caps would gather OOB
    # (silent NaNs under jit; the models also guard this at trace time).
    if model == "gpt":
        return GptTTSDataset(entries, mel_cache, tokenizer,
                             max_text=min(300, cfg.gpt.max_text_tokens),
                             max_mel=min(2000, 4 * cfg.gpt.max_mel_tokens),
                             mel_hop=cfg.mel.hop_length, seed=seed)
    if model == "diffusion":
        return DiffusionDataset(entries, mel_cache, tokenizer,
                                max_mel=min(400, 4 * cfg.gpt.max_mel_tokens),
                                max_refer=min(300,
                                              4 * cfg.gpt.max_mel_tokens),
                                mel_hop=cfg.mel.hop_length, seed=seed)
    if model == "clvp":
        max_codes = min(430, cfg.clvp.speech_seq_len)
        if not cfg.clvp.use_xformers:
            # live-tower quirk: speech pos table sized num_speech_tokens
            # (ttts/clvp/model.py:98)
            max_codes = min(max_codes, cfg.clvp.num_speech_tokens)
        return CLVPDataset(entries, tokenizer,
                           max_text=min(350, cfg.clvp.text_seq_len),
                           max_codes=max_codes)
    raise ValueError(model)


def build_collate(model: str, cfg: Optional[XTTSConfig] = None):
    from xtts_tpu.data.datasets import (MEL_BUCKETS, TEXT_BUCKETS,
                                        collate_bucketed)
    if model == "classifier":
        def collate(samples):
            samples = [s for s in samples if s is not None]
            if not samples:
                return None
            return {"mel": np.stack([s["mel"].T for s in samples]),
                    "label": np.stack([s["label"] for s in samples])}
        return collate

    def clamp(buckets, cap):
        """Bucket ladder never padding past the model's capacity `cap`
        (padding chooses the next bucket >= the batch max, so a ladder rung
        above a position-table size would gather OOB -> silent NaNs)."""
        if cap is None:
            return buckets
        kept = tuple(b for b in buckets if b < cap)
        return kept + (cap,)

    t_cap = cfg.gpt.max_text_tokens if cfg else None
    m_cap = 4 * cfg.gpt.max_mel_tokens if cfg else None
    text_b = clamp(TEXT_BUCKETS, t_cap)
    mel_b = clamp(MEL_BUCKETS, m_cap)
    if cfg and model == "clvp":
        c_cap = min(430, cfg.clvp.speech_seq_len)
        if not cfg.clvp.use_xformers:
            c_cap = min(c_cap, cfg.clvp.num_speech_tokens)
        text_b = clamp(TEXT_BUCKETS, cfg.clvp.text_seq_len)
    else:
        c_cap = None
    pads = {
        "vqvae": ({}, {}),
        "gpt": ({"text": 0, "mel": 1, "cond_mel": 1},
                {"text": text_b, "mel": mel_b, "cond_mel": MEL_BUCKETS}),
        "diffusion": ({"text": 0, "mel": 1, "refer_mel": 1},
                      {"text": text_b, "mel": mel_b,
                       "refer_mel": mel_b}),
        "clvp": ({"text": 0, "codes": 0},
                 {"text": text_b, "codes": clamp((128, 256, 430), c_cap)}),
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


def train_dtype(cfg: XTTSConfig):
    """Compute dtype for the TRAINED model (TrainConfig.dtype; params stay
    f32 via flax param_dtype). Frozen aux models (DVAE codes, GPT latents)
    stay f32: the reference calls them under no_grad OUTSIDE the autocast
    context (ttts/gpt/train_ms.py:216-218, ttts/diffusion/train_ms.py:311),
    and VQ argmin / latent extraction feed targets whose precision matters."""
    import jax.numpy as jnp
    table = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
    if cfg.train.dtype not in table:
        raise ValueError(f"TrainConfig.dtype={cfg.train.dtype!r}: "
                         f"use one of {sorted(table)}")
    return table[cfg.train.dtype]


def build_loss(model: str, cfg: XTTSConfig, args):
    """Returns (loss_fn, params, state_cols, ctx) — ctx holds the frozen
    aux models so eval rendering can reuse them."""
    from xtts_tpu.utils.registry import load_model
    dt = train_dtype(cfg)
    if model == "vqvae":
        from xtts_tpu.train.steps import make_dvae_loss
        m, variables = load_model("vqvae", cfg, dtype=dt)
        cols = {"codebook": dict(variables["codebook"])}
        return (make_dvae_loss(m, ema_decay=cfg.vqvae.ema_decay),
                variables["params"], cols, {"dvae": m})
    if model == "gpt":
        from xtts_tpu.train.steps import make_gpt_loss
        if cfg.train.remat != "none":
            cfg = cfg.replace(gpt=cfg.gpt.replace(remat=cfg.train.remat))
        gpt, gv = load_model("gpt", cfg, dtype=dt)
        dvae, dv = load_model("vqvae", cfg, weights_path=args.dvae_weights)
        return (make_gpt_loss(gpt, dvae, dv, cfg.train.text_weight,
                              cfg.train.mel_weight), gv["params"], {}, {})
    if model == "diffusion":
        from xtts_tpu.diffusion.gaussian import (GaussianDiffusion,
                                                 get_named_beta_schedule)
        from xtts_tpu.train.steps import make_diffusion_loss
        if cfg.train.remat != "none":
            cfg = cfg.replace(
                diffusion=cfg.diffusion.replace(remat=cfg.train.remat))
        diff, fv = load_model("diffusion", cfg, dtype=dt)
        gpt, gv = load_model("gpt", cfg, weights_path=args.gpt_weights)
        dvae, dv = load_model("vqvae", cfg, weights_path=args.dvae_weights)
        gd = GaussianDiffusion(betas=get_named_beta_schedule(
            cfg.diffusion_process.schedule, cfg.diffusion_process.timesteps))
        ctx = {"diff": diff, "gpt": gpt, "gpt_vars": gv,
               "dvae": dvae, "dvae_vars": dv}
        return (make_diffusion_loss(
            diff, gd, gpt, gv, dvae, dv,
            cfg.diffusion.unconditioned_percentage), fv["params"], {}, ctx)
    if model == "clvp":
        from xtts_tpu.models.clvp import make_clvp_loss
        m, variables = load_model("clvp", cfg, dtype=dt)
        return make_clvp_loss(m), variables["params"], {}, {}
    if model == "classifier":
        from xtts_tpu.models.classifier import make_classifier_loss
        m, variables = load_model("classifier", cfg, dtype=dt)
        return make_classifier_loss(m), variables["params"], {}, {}
    raise ValueError(model)


def build_eval_render(model: str, cfg: XTTSConfig, args, ctx):
    """Per-family held-out sample renderer for the eval loop, matching the
    reference's TensorBoard eval audio/mel (ttts/diffusion/train.py:213-247
    renders one eval sample through do_spectrogram_diffusion + vocos;
    ttts/vqvae/inference.py:31-115 dumps recon mel images).

    Returns render(params, state_cols, batch, ml, step) or None."""
    import jax.numpy as jnp

    if model == "vqvae":
        dvae = ctx["dvae"]

        def render_vqvae(params, state_cols, batch, ml, step):
            mel = jnp.asarray(batch["mel"][:1])
            variables = {"params": params,
                         "codebook": state_cols["codebook"]}
            codes = dvae.apply(variables, mel,
                               method=dvae.get_codebook_indices)
            recon, _ = dvae.apply(variables, codes, method=dvae.decode)
            ml.image_mel(step, "eval/mel_gt", np.asarray(mel[0]))
            ml.image_mel(step, "eval/mel_recon", np.asarray(recon[0]))

        return render_vqvae

    if model == "diffusion":
        from xtts_tpu.diffusion.gaussian import GaussianDiffusion
        from xtts_tpu.models.aa_diffusion import (denormalize_tacotron_mel,
                                                  normalize_tacotron_mel)
        diff, gpt = ctx["diff"], ctx["gpt"]
        gpt_vars, dvae, dvae_vars = ctx["gpt_vars"], ctx["dvae"], ctx["dvae_vars"]
        vocos_pair = None
        if getattr(args, "vocos_weights", None):
            from xtts_tpu.utils.registry import load_model
            vocos_pair = load_model("vocos", cfg,
                                    weights_path=args.vocos_weights)
        steps = max(2, min(15, cfg.diffusion_process.timesteps))
        gd = GaussianDiffusion.spaced(
            cfg.diffusion_process.timesteps, steps,
            schedule=cfg.diffusion_process.schedule, conditioning_free=False)

        # frozen vars as jit ARGUMENTS (remote-compile payload; PERF.md r5)
        def sample_mel(params, gv_, dv_, mel, refer, text, text_lengths,
                       wav_lengths, key):
            codes = dvae.apply(dv_, mel,
                               method=dvae.get_codebook_indices)
            latent = gpt.apply(gv_, refer, text, text_lengths, codes,
                               wav_lengths, return_latent=True)
            latent = jnp.swapaxes(latent, 1, 2)
            refer_n = normalize_tacotron_mel(refer)

            def model_fn(x, t):
                return diff.apply({"params": params}, x, t, latent, refer_n)

            shape = (1, cfg.diffusion.in_channels, latent.shape[-1] * 4)
            out = gd.sample_loop(model_fn, shape, key, sampler="ddim")
            return denormalize_tacotron_mel(out)

        sample_jit = jax.jit(sample_mel)

        def render_diffusion(params, state_cols, batch, ml, step):
            mel = jnp.asarray(batch["mel"][:1])
            out = sample_jit(params, gpt_vars, dvae_vars, mel,
                             jnp.asarray(batch["refer_mel"][:1]),
                             jnp.asarray(batch["text"][:1]),
                             jnp.asarray(batch["text_lengths"][:1]),
                             jnp.asarray(batch["wav_lengths"][:1]),
                             jax.random.PRNGKey(step))
            ml.image_mel(step, "eval/mel_gt", np.asarray(mel[0]))
            ml.image_mel(step, "eval/mel_diffusion", np.asarray(out[0]))
            if vocos_pair is not None:
                vocos, vv = vocos_pair
                wav = vocos.apply(vv, out)
                ml.audio(step, "eval/wav", np.asarray(wav[0]),
                         sample_rate=cfg.mel.sample_rate)

        return render_diffusion

    return None


def build_gan_trainer(cfg: XTTSConfig, gpt_weights=None, dvae_weights=None):
    """HiFi-GAN GANTrainer + init state + jittable generator fn
    (ttts/hifigan/train_ms.py:62-121 setup). Shared by the CLI trainer and
    the BENCH_PATH=train hifigan family so the bench measures the exact
    production program."""
    from xtts_tpu.models.hifigan_discriminator import HifiganDiscriminator
    from xtts_tpu.train.gan import GANTrainer, make_hifigan_generator_fn
    from xtts_tpu.utils.registry import load_model

    import jax.numpy as jnp

    decoder, _ = load_model("hifigan", cfg, dtype=train_dtype(cfg))
    # decoder init via registry only covers the g= path; re-init with a ref
    # mel so the speaker encoder gets params too
    dummy_lat = jnp.zeros((1, 8, cfg.hifigan.decoder_input_dim))
    dummy_ref = jnp.zeros((1, 16, 64))
    dvars = jax.jit(decoder.init)(jax.random.PRNGKey(cfg.train.seed),
                                  dummy_lat, ref_mel16k=dummy_ref)
    disc = HifiganDiscriminator()
    disc_vars = jax.jit(disc.init)(jax.random.PRNGKey(cfg.train.seed + 1),
                                   jnp.zeros((1, 2048)))
    gpt, gv = load_model("gpt", cfg, weights_path=gpt_weights)
    dvae, dv = load_model("vqvae", cfg, weights_path=dvae_weights)

    gen_fn = make_hifigan_generator_fn(decoder, gpt, gv, dvae, dv)
    disc_fn = lambda p, wav: disc.apply({"params": p}, wav)
    trainer = GANTrainer(gen_fn, disc_fn, g_lr=cfg.train.lr,
                         d_lr=cfg.train.lr, grad_clip=cfg.train.grad_clip,
                         frozen=gen_fn.frozen)
    state = trainer.init_state(dvars["params"], disc_vars["params"])
    return trainer, state, gen_fn


def _train_hifigan(args, cfg: XTTSConfig, tok, logger):
    """GAN loop: HifiDecoder generator vs MPD+MSD (ttts/hifigan/train_ms.py),
    latents from frozen GPT+DVAE each step."""
    from xtts_tpu.core.logging import MetricLogger, StepTimer
    from xtts_tpu.data.datasets import (HifiGANDataset, batch_iterator,
                                        collate_bucketed, read_filelist)
    from xtts_tpu.dsp.mel import MelFrontend

    from xtts_tpu.dsp.mel import SPEAKER_ENCODER_MEL_CONFIG
    mel_fn = MelFrontend(cfg.mel)
    # the HiFi-GAN speaker encoder's 16 kHz 64-bin log-mel
    # (hifigan_vocoder.py:671-678) — same constant the inference API uses
    mel16_fn = MelFrontend(SPEAKER_ENCODER_MEL_CONFIG)
    dataset = HifiGANDataset(read_filelist(args.filelist), tok, mel_fn,
                             mel16_fn, sample_rate=cfg.mel.sample_rate,
                             seed=cfg.train.seed)
    logger.info("hifigan dataset: %d samples", len(dataset))

    trainer, state, gen_fn = build_gan_trainer(
        cfg, gpt_weights=args.gpt_weights, dvae_weights=args.dvae_weights)
    # frozen as a runtime arg of the jitted render (payload; PERF.md r5)
    _render_impl = jax.jit(gen_fn)
    render_gen = lambda p, b, r: _render_impl(p, b, r, gen_fn.frozen)

    from xtts_tpu.core.checkpoint import CheckpointManager
    ckpt = CheckpointManager(os.path.join(args.model_dir, "ckpt"),
                             keep=cfg.train.keep_ckpts)
    if args.resume and ckpt.latest_step() is not None:
        from xtts_tpu.train.gan import GANState
        payload = ckpt.restore(target={
            "g": state.g_params, "d": state.d_params,
            "g_opt": state.g_opt, "d_opt": state.d_opt,
            "step": state.step})
        state = GANState(payload["g"], payload["d"], payload["g_opt"],
                         payload["d_opt"], payload["step"])
        logger.info("hifigan resumed at step %d", int(state.step))
    ml = MetricLogger(os.path.join(args.model_dir, "logs"), console_every=10)
    timer = StepTimer()
    collate = lambda ss: collate_bucketed(
        ss, {"text": 0, "refer_mel16": 0},
        {"text": (64, 128, 304), "refer_mel16": (100, 200, 300)})
    it = batch_iterator(dataset, cfg.train.batch_size, collate,
                        seed=cfg.train.seed,
                        prefetch=getattr(args, "prefetch", 0))
    rng = jax.random.PRNGKey(cfg.train.seed)
    step = 0
    for batch in it:
        if batch is None:
            continue
        batch.pop("text", None)
        batch.pop("text_length", None)
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.step(state, batch, sub)
        step = int(state.step)
        timer.tick()
        ml.scalars(step, {**metrics, "step_time": timer.mean})
        if step % cfg.train.val_freq == 0:
            # render the generator on the current batch's first sample
            # (the reference's eval spot-check audio, train.py:213-247)
            import numpy as _np
            wav_hat = render_gen(state.g_params,
                                 {k: v[:1] for k, v in batch.items()}, sub)
            ml.audio(step, "eval/wav_gen", _np.asarray(wav_hat[0]),
                     sample_rate=cfg.mel.sample_rate)
            ml.audio(step, "eval/wav_gt", _np.asarray(batch["wav"][0]),
                     sample_rate=cfg.mel.sample_rate)
        if step % cfg.train.save_freq == 0:
            ckpt.save(step, {"g": state.g_params, "d": state.d_params,
                             "g_opt": state.g_opt, "d_opt": state.d_opt,
                             "step": state.step})
        if step >= cfg.train.train_steps:
            break
    ckpt.save(step, {"g": state.g_params, "d": state.d_params,
                     "g_opt": state.g_opt, "d_opt": state.d_opt,
                     "step": state.step})
    ckpt.wait()
    _export_weights(args.model_dir, "hifigan", {"params": state.g_params},
                    logger)
    ml.close()
    logger.info("hifigan done at step %d", step)


def _export_weights(model_dir: str, family: str, variables, logger) -> None:
    """Write <model_dir>/<family>.npz (weights + collections) — the
    artifact downstream stages (--dvae-weights/--gpt-weights) and
    TextToSpeech.from_pretrained load; the reference's analogue is the
    torch.save model state in each train_ms.py save_checkpoint."""
    from xtts_tpu.utils.registry import save_npz
    path = os.path.join(model_dir, f"{family}.npz")
    save_npz(path, jax.device_get(variables))
    logger.info("exported %s", path)


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", choices=["vqvae", "gpt", "diffusion", "clvp",
                                      "hifigan", "classifier"])
    ap.add_argument("-c", "--config", default=None,
                    help="XTTSConfig JSON (defaults to shipped config)")
    ap.add_argument("-m", "--model-dir", required=True,
                    help="experiment dir (checkpoints + logs)")
    ap.add_argument("--filelist", required=True,
                    help="6-field filelist; for classifier: the CLEAN "
                         "wav-path list")
    ap.add_argument("--noise-filelist", default=None,
                    help="classifier only: noisy wav-path list")
    ap.add_argument("--val-filelist", default=None,
                    help="held-out filelist; eval loss every train.val_freq "
                         "steps (ttts/gpt/train_ms.py:162-186 eval loop)")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--dvae-weights", default=None)
    ap.add_argument("--gpt-weights", default=None)
    ap.add_argument("--vocos-weights", default=None,
                    help="diffusion family: render eval audio through this "
                         "vocoder (ttts/diffusion/train.py:226-233)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override train.train_steps")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="background-thread batch prefetch depth (0 = off;"
                         " the reference's DataLoader num_workers analogue)")
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
    if args.model == "hifigan":
        return _train_hifigan(args, cfg, tok, logger)
    dataset = build_dataset(args.model, cfg, args.filelist, tok,
                            cfg.train.seed,
                            noise_filelist=args.noise_filelist)
    logger.info("dataset: %d samples", len(dataset))

    loss_fn, params, cols, loss_ctx = build_loss(args.model, cfg, args)
    trainer = Trainer(loss_fn, cfg.train, accum_steps=1,
                      checkpoint_dir=os.path.join(args.model_dir, "ckpt"),
                      frozen=getattr(loss_fn, "frozen", None))
    state = trainer.init_state(params, cols)
    if args.resume:
        state = trainer.restore(state)
        logger.info("resumed at step %d", int(state.step))

    ml = MetricLogger(os.path.join(args.model_dir, "logs"), console_every=10)
    timer = StepTimer()
    collate = build_collate(args.model, cfg)
    it = batch_iterator(dataset, cfg.train.batch_size, collate,
                        seed=cfg.train.seed,
                        prefetch=getattr(args, "prefetch", 0))
    rng = jax.random.PRNGKey(cfg.train.seed)

    eval_fn = None
    render_fn = None
    val_batches = []
    if args.val_filelist:
        render_fn = build_eval_render(args.model, cfg, args, loss_ctx)
        val_ds = build_dataset(args.model, cfg, args.val_filelist, tok,
                               cfg.train.seed + 1,
                               noise_filelist=args.noise_filelist)
        val_batches = [adapt_batch(args.model, b) for b in batch_iterator(
            val_ds, cfg.train.batch_size, collate, shuffle=False,
            epochs=1)][:8]
        _fz = getattr(loss_fn, "frozen", None)
        if _fz is not None:
            # frozen as a traced ARG (not a closure constant; PERF.md r5)
            _eval_impl = jax.jit(
                lambda p, cols, b, r, fz: loss_fn(p, cols, b, r, fz)[0])
            eval_fn = lambda p, cols, b, r: _eval_impl(p, cols, b, r, _fz)
        else:
            eval_fn = jax.jit(
                lambda p, cols, b, r: loss_fn(p, cols, b, r)[0])
        logger.info("eval: %d held-out batches", len(val_batches))

    for batch in it:
        batch = adapt_batch(args.model, batch)
        if batch is None:
            continue
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.step(state, batch, sub)
        step = int(state.step)
        timer.tick()
        ml.scalars(step, {**metrics, "step_time": timer.mean})
        if eval_fn is not None and step % cfg.train.val_freq == 0:
            losses = [float(eval_fn(state.params, state.state_cols, vb,
                                    jax.random.PRNGKey(0)))
                      for vb in val_batches if vb is not None]
            if losses:
                ml.scalars(step, {"loss": float(np.mean(losses))},
                           prefix="eval/")
            if render_fn is not None and val_batches \
                    and val_batches[0] is not None:
                render_fn(state.params, state.state_cols, val_batches[0],
                          ml, step)
        if step % cfg.train.save_freq == 0:
            trainer.save(state)
            logger.info("checkpoint @ %d", step)
        if step >= cfg.train.train_steps:
            break
    trainer.save(state, wait=True)
    _export_weights(args.model_dir, args.model,
                    {"params": state.params, **dict(state.state_cols or {})},
                    logger)
    ml.close()
    logger.info("done at step %d", int(state.step))


if __name__ == "__main__":
    main()
