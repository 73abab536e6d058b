"""Per-model loss functions for the generic Trainer.

Mirrors the reference training semantics:
* DVAE: smooth_l1 + 0.5*SSIM + 0.25*commitment, EMA codebook update
  (ttts/vqvae/train_ms.py:163-166, ttts/gpt/config.json "vqvae")
* GPT: 0.01*text CE + 1.0*mel CE over DVAE codes from the frozen quantizer
  (ttts/gpt/train_ms.py:216-222, ttts/gpt/config.json "train")
* Diffusion: MSE(eps)+vb on normalized mels, hint = frozen GPT latents with
  padding zeroed, 10% unconditional dropout
  (ttts/diffusion/train_ms.py:276-325, aa_model.py:320-328)
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from xtts_tpu.diffusion.gaussian import GaussianDiffusion
from xtts_tpu.models.aa_diffusion import AADiffusion, normalize_tacotron_mel
from xtts_tpu.models.dvae import (BalanceState, CodebookState, DVAE,
                                  balance_codebook, ema_codebook_update)
from xtts_tpu.models.gpt import UnifiedVoice


def make_dvae_loss(model: DVAE, commitment_weight: float = 0.25,
                   ema_decay: float = 0.99):
    """batch: {'mel': (B, bins, T)}; state_cols: {'codebook': {...}}."""

    def loss_fn(params, state_cols, batch, rng):
        variables = {"params": params, "codebook": state_cols["codebook"]}
        recon, ssim_l, commit, _, (osum, esum) = model.apply(
            variables, batch["mel"])
        loss = recon + ssim_l + commitment_weight * commit
        cb = CodebookState(**{k: state_cols["codebook"][k]
                              for k in ("embed", "cluster_size", "embed_avg")})
        # under jit+GSPMD the sums over the data-sharded batch already
        # all-reduce; in shard_map contexts pass axis_name instead
        new_cb = ema_codebook_update(cb, osum, esum, decay=ema_decay,
                                     eps=model.cfg.ema_eps)
        new_cols = {"codebook": {"embed": new_cb.embed,
                                 "cluster_size": new_cb.cluster_size,
                                 "embed_avg": new_cb.embed_avg}}
        if "bal_hist" in state_cols["codebook"]:
            # balancing heuristic (xtts_dvae.py:53-85, cfg.balancing_heuristic)
            bal = BalanceState(state_cols["codebook"]["bal_hist"],
                               state_cols["codebook"]["bal_total"])
            new_cb, new_bal, _ = balance_codebook(
                new_cb, bal, osum, rng, window=model.cfg.balance_window)
            new_cols["codebook"].update(
                embed=new_cb.embed, cluster_size=new_cb.cluster_size,
                embed_avg=new_cb.embed_avg, bal_hist=new_bal.hist,
                bal_total=new_bal.total)
        aux = {"recon": recon, "ssim": ssim_l, "commitment": commit,
               "new_state_cols": new_cols}
        return loss, aux

    return loss_fn


def make_gpt_loss(gpt: UnifiedVoice, dvae: DVAE, dvae_vars,
                  text_weight: float = 0.01, mel_weight: float = 1.0):
    """batch: {'cond_mel','text','text_lengths','mel','wav_lengths'} —
    mel-code extraction runs the frozen DVAE online like
    ttts/gpt/train_ms.py:216-217."""

    def loss_fn(params, state_cols, batch, rng, frozen=None):
        dv_ = frozen["dvae_vars"] if frozen is not None else dvae_vars
        codes = dvae.apply(dv_, batch["mel"],
                           method=dvae.get_codebook_indices)
        codes = jax.lax.stop_gradient(codes)
        loss_text, loss_mel = gpt.apply(
            {"params": params}, batch["cond_mel"], batch["text"],
            batch["text_lengths"], codes, batch["wav_lengths"])
        loss = text_weight * loss_text + mel_weight * loss_mel
        return loss, {"loss_text": loss_text, "loss_mel": loss_mel}

    # frozen DVAE as a runtime argument of the jitted step instead of a
    # ~206 MB embedded constant (see make_diffusion_loss docstring)
    loss_fn.frozen = {"dvae_vars": dvae_vars}
    return loss_fn


def _scan_latent_gpt(gpt: UnifiedVoice, gpt_vars):
    """Optionally (XTTS_SCAN_LATENT=1) swap the frozen GPT to
    scan-over-layers execution for latent extraction — an ~L× smaller
    program to compile, math-identical (tests/test_gpt.py).

    Default is the UNROLLED stack: the round-5 "scan fixes the compile
    hang" hypothesis was retracted when the hang's root cause turned out
    to be closure-captured params bloating the remote-compile payload
    (PERF.md round 5) — the unrolled form is what the e2e inference path
    already compiles and runs on the chip."""
    import os
    if gpt.scan_stack or os.environ.get("XTTS_SCAN_LATENT", "0") != "1":
        return gpt, gpt_vars
    from xtts_tpu.nn.transformer import scan_gpt_variables
    return (gpt.clone(scan_stack=True),
            scan_gpt_variables(gpt_vars, gpt.cfg.layers))


def diffusion_latent_fn(gpt: UnifiedVoice, gpt_vars, dvae: DVAE, dvae_vars,
                        jit: bool = True):
    """The frozen-aux half of the diffusion train step: mel -> DVAE codes ->
    teacher-forced GPT latents, padding-zeroed (ttts/diffusion/
    train_ms.py:311-319). Factored out so it can run as its OWN jitted
    program (pass its output as batch['latent'] to make_diffusion_loss) —
    split programs compile separately (each with a small remote-compile
    payload — frozen vars are ARGUMENTS, see diffusion_latent_impl) and
    compute identically (tests/test_train.py pins equality)."""
    gpt, gpt_vars = _scan_latent_gpt(gpt, gpt_vars)

    impl = diffusion_latent_impl(gpt, dvae)
    inner = jax.jit(impl) if jit else impl

    def latent_of(batch):
        return inner(gpt_vars, dvae_vars, batch)

    return latent_of


def diffusion_latent_impl(gpt: UnifiedVoice, dvae: DVAE):
    """Unbound frozen-latent pass: f(gpt_vars, dvae_vars, batch) ->
    masked latent (B, D, N).

    The frozen params are function ARGUMENTS, never closure captures:
    closed-over params embed as constants in the serialized HLO, and the
    933 MB GPT f32 tree either trips the remote-compile service's request
    body limit (HTTP 413 — observed 2026-08-20 22:55) or uploads through
    the tunnel for ~25 min until the HTTP pipe drops — the entire
    round-4/5 "phase-13 compile hang" (PERF.md round 5; args-passed, the
    same program compiles in 11 s)."""

    def latent_fn(gv_, dv_, batch):
        codes = dvae.apply(dv_, batch["mel"],
                           method=dvae.get_codebook_indices)
        codes = jax.lax.stop_gradient(codes)
        latent = gpt.apply(
            gv_, batch["refer_mel"], batch["text"],
            batch["text_lengths"], codes, batch["wav_lengths"],
            return_latent=True)                     # (B, N, D)
        latent = jax.lax.stop_gradient(jnp.swapaxes(latent, 1, 2))  # (B,D,N)
        n = latent.shape[-1]
        code_lens = jnp.ceil(
            batch["wav_lengths"] / gpt.cfg.mel_length_compression
        ).astype(jnp.int32) + 1
        mask = (jnp.arange(n)[None, :] < code_lens[:, None])
        return latent * mask[:, None, :]

    return latent_fn


def make_diffusion_loss(diff: AADiffusion, gd: GaussianDiffusion,
                        gpt: UnifiedVoice, gpt_vars,
                        dvae: DVAE, dvae_vars,
                        unconditioned_percentage: float = 0.1,
                        timestep_sampler: str = "uniform"):
    """batch: {'mel','refer_mel','text','text_lengths','wav_lengths'}.

    Recomputes codes + latents with the frozen GPT/DVAE each step
    (ttts/diffusion/train_ms.py:311-319), zeroes latent padding, then takes a
    diffusion training step on the tacotron-normalized target mel.

    timestep_sampler: 'uniform' or 'loss_second_moment' (importance sampling
    with loss-history state in state_cols['t_sampler'] —
    ttts/utils/resample.py semantics).

    The returned loss_fn accepts an optional 5th arg `frozen` =
    {'gpt_vars', 'dvae_vars'} — pass `Trainer(..., frozen=loss_fn.frozen)`
    so the frozen params enter the jitted train step as runtime ARGUMENTS
    instead of ~1.1 GB of embedded HLO constants, which break the tunneled
    chip's remote-compile transport (PERF.md round 5 root cause).
    """
    resampler = None
    if timestep_sampler == "loss_second_moment":
        from xtts_tpu.diffusion.resample import (LossAwareState,
                                                 LossSecondMomentResampler)
        resampler = LossSecondMomentResampler(gd.num_timesteps)

    gpt_l, gpt_vars_l = _scan_latent_gpt(gpt, gpt_vars)
    latent_impl = diffusion_latent_impl(gpt_l, dvae)

    def loss_fn(params, state_cols, batch, rng, frozen=None):
        r_t, r_noise, r_uc, r_pd = jax.random.split(rng, 4)
        mel = batch["mel"]
        b = mel.shape[0]

        if "latent" in batch:
            # precomputed by diffusion_latent_fn (two-program mode): the
            # frozen GPT/DVAE pass runs as its own jitted program — same
            # math, two smaller XLA programs
            latent = batch["latent"]
        else:
            gv_ = frozen["gpt_vars"] if frozen is not None else gpt_vars_l
            dv_ = frozen["dvae_vars"] if frozen is not None else dvae_vars
            latent = latent_impl(gv_, dv_, batch)

        x_start = normalize_tacotron_mel(mel)
        if resampler is not None:
            from xtts_tpu.diffusion.resample import LossAwareState
            st = LossAwareState(**state_cols["t_sampler"])
            t, w = resampler.sample(r_t, b, st)
        else:
            t = jax.random.randint(r_t, (b,), 0, gd.num_timesteps)
            w = jnp.ones((b,), jnp.float32)
        uncond = jax.random.uniform(r_uc, (b,)) < unconditioned_percentage

        def model_fn(x_t_batch, t_orig):
            # train=True enables the CLIP PatchDropout regularizer the
            # reference trains with (config.yaml clip.patch_dropout=0.4)
            return diff.apply({"params": params}, x_t_batch, t_orig, latent,
                              normalize_tacotron_mel(batch["refer_mel"]),
                              uncond_mask=uncond, train=True,
                              rngs={"patch_drop": r_pd})

        terms = gd.training_losses(model_fn, x_start, t, r_noise)
        loss = (terms["loss"] * w).mean()
        aux = {"mse": terms["mse"].mean(), "vb": terms["vb"].mean()}
        if resampler is not None:
            new_st = resampler.update(st, t, jax.lax.stop_gradient(
                terms["loss"]))
            aux["new_state_cols"] = {
                **state_cols,
                "t_sampler": {"history": new_st.history,
                              "counts": new_st.counts}}
        return loss, aux

    if resampler is not None:
        loss_fn.init_sampler_state = lambda: {
            "t_sampler": resampler.init_state()._asdict()}
    # canonical frozen tree for Trainer(frozen=...): matches the latent
    # engine's expected layout (scan-converted when the fwd engine scans)
    loss_fn.frozen = {"gpt_vars": gpt_vars_l, "dvae_vars": dvae_vars}
    return loss_fn
