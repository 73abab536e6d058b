"""End-to-end zero-shot synthesis benchmark on the real TPU chip.

Measures the BASELINE.json headline: RTF per chip (wall-seconds per
audio-second) for the full pipeline — GPT AR decode (KV-cache while_loop)
-> teacher-forced latent re-extract -> 50-step CFG diffusion -> Vocos.
Random weights (no public checkpoints in this image), flagship shapes
(233M-class GPT 15L/1024d, 512ch UNet, vocos-24k), bf16 compute.

Prints ONE JSON line:
  {"metric": "e2e_rtf_per_chip", "value": RTF, "unit": "wall_s_per_audio_s",
   "vs_baseline": target(0.1)/RTF}      # >1.0 beats the BASELINE target

Knobs (env):
  BENCH_MAX_GEN     AR token budget           (default 300)
  BENCH_DIFF_STEPS  diffusion steps           (default 50)
  BENCH_REPEATS     timed repetitions         (default 5; e2e reports the
                    MEDIAN RTF plus p50/p90 utterance latency and variance)
  BENCH_BATCH       serving batch size        (default 8)
  BENCH_QUANT       1 (default) = int8 weight-only AR decode engine
  BENCH_PATH        'e2e' (default) | 'ar' (GPT tokens/sec, batch 1)
                    | 'serving' (batched synthesis audio-s/s per chip:
                    headline = full-quality 50-step CFG diffusion with
                    CLVP rerank; shortcut render reported alongside)
                    | 'slots' (continuous batching: BENCH_SLOTS_N
                    mixed-length requests drained through a
                    BENCH_BATCH-slot pool with mid-stream refill,
                    full-diffusion renders)
                    | 'vqvae' (BASELINE config #1: mel -> VQ codes ->
                    decoded mel round-trip, audio-s/s)
                    | 'vocos' (BASELINE config #3: mel -> 24 kHz wav,
                    audio-s/s)
                    | 'hifigan' (XTTS-v2-style alternative render: AR ->
                    teacher-forced latent -> HifiDecoder wav, no
                    diffusion/vocos; e2e RTF)
  BENCH_RERANK_K    serving CLVP candidates per utterance (default 2;
                    1 = rerank off)
  BENCH_CACHE_LADDER  comma-separated cache-capacity rungs for the serving
                    AR decode (e.g. "128,256"); unset = "auto" ((128, 256)
                    at >=16 AR rows — the round-4 serving default);
                    "none" = monolithic cache (see TTSSettings.cache_ladder)
  BENCH_REFNET_INTERVAL  sparse ReferenceNet hoist interval k (default 1 =
                    exact reference semantics; see
                    TTSSettings.refnet_interval)
  BENCH_COMPACT_ROWS  comma-separated row buckets for compacting decode
                    waves (e.g. "1,2,4,8"); empty/unset = monolithic
                    batch (see TTSSettings.compact_rows)
  BENCH_MIXED_TEXT=1  serving rows carry different texts of varied lengths
                    (the traffic shape where compaction pays off)
  BENCH_PATH=train  training-step throughput for one family (the pjit
                    Trainer program: fwd + bwd + AdamW + clip, bf16 compute
                    / f32 params, synthetic reference-scale batches):
    BENCH_TRAIN_FAMILY  gpt (default, bs 8 — ttts/gpt/config.json) |
                        vqvae (bs 64, 200-frame crops) |
                        diffusion (bs 16; reference runs 64 — the frozen
                        15-layer GPT latent pass at bs 64 compiles >30 min
                        on this 1-core host, see scripts/remat_hbm.py)
    BENCH_TRAIN_BS      override the family batch size
    BENCH_TRAIN_STEPS   timed optimizer steps (default 10)
    BENCH_REMAT         remat policy for the trained blocks (default none)
"""
import json
import os
import sys
import time

# persistent XLA compile cache: repeat bench runs skip the multi-minute
# full-model compiles (safe no-op if the dir is unwritable)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))

import jax

# honor an explicit JAX_PLATFORMS=cpu request (CPU smoke runs of the train
# path): on this image env vars alone don't override the sitecustomize
# platform pin — the config update must land before any backend touch.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

TARGET_RTF = 0.1  # BASELINE.json north star: <= 0.1 per v5e chip


def synthetic_inputs(tts, cfg, text_len: int = 50, return_wav: bool = False):
    """Canonical bench inputs (3 s sine+noise reference clip -> cond mel,
    random 50-token text). Shared by scripts/ab_*.py so the A/B harnesses
    measure exactly the workload the headline numbers use."""
    rng = np.random.default_rng(0)
    sr = cfg.mel.sample_rate
    t = np.arange(3 * sr) / sr
    cond_wav = (0.3 * np.sin(2 * np.pi * 220 * t)
                + 0.1 * rng.standard_normal(3 * sr)).astype(np.float32)
    cond_mel = tts.cond_mel_from_wav(cond_wav)
    text_tokens = rng.integers(3, 250, (1, text_len)).astype(np.int32)
    if return_wav:
        return cond_mel, text_tokens, cond_wav
    return cond_mel, text_tokens


def _bench_train_gan(cfg, args, bs, steps, rng):
    """HiFi-GAN family: the two-optimizer GAN step (generator + MPD/MSD +
    multi-scale STFT losses, frozen GPT latents online —
    ttts/hifigan/train_ms.py:62-121) on 2 s crops."""
    from xtts_tpu.train.cli import build_gan_trainer

    gan, state, _ = build_gan_trainer(cfg, gpt_weights=args.gpt_weights,
                                      dvae_weights=args.dvae_weights)

    # crop length in seconds (BENCH_TRAIN_SECONDS; tiny CPU smoke uses <1)
    secs = float(os.environ.get("BENCH_TRAIN_SECONDS", 2.0))
    wav_len = int(secs * cfg.mel.sample_rate) // 256 * 256
    # clamp the crop to the GPT's mel-position capacity so tiny CPU-smoke
    # configs don't trip the trainer's guard (no-op on the real config:
    # 2 s is ~48 codes vs max_mel_tokens=608)
    cap = (cfg.gpt.max_mel_tokens - 2) * cfg.gpt.mel_length_compression
    wav_len = min(wav_len, cap // 256 * 256)
    frames = wav_len // cfg.mel.hop_length
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((bs, wav_len)).astype(np.float32) * 0.1),
        "mel": jnp.asarray(rng.standard_normal(
            (bs, cfg.mel.n_mels, frames)).astype(np.float32) * 0.1),
        "refer_mel16": jnp.asarray(
            rng.standard_normal((bs, 300, 64)).astype(np.float32) * 0.1),
        "wav_length": jnp.full((bs,), wav_len, jnp.int32)}

    # BENCH_SPLIT_FROZEN=1: frozen DVAE->GPT latent pass as its OWN jitted
    # program per step (the fused GAN step's compile exceeds the tunneled
    # chip's remote-compile transport limit — PERF.md round 4); the timed
    # loop includes both programs.
    split = os.environ.get("BENCH_SPLIT_FROZEN", "0") == "1"
    if split:
        # latent_of is internally jitted with the frozen vars as ARGUMENTS;
        # do not re-wrap it in jax.jit (re-captures them as constants)
        latent_fn = gan.gen.latent_of
        step_batch = lambda b_: {**b_, "latent": latent_fn(b_)}
    else:
        step_batch = lambda b_: b_

    key = jax.random.PRNGKey(0)
    state, metrics = gan.step(state, step_batch(batch), key)    # compile
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = gan.step(state, step_batch(batch),
                                  jax.random.fold_in(key, i))
    g_loss = float(metrics["g_loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_hifigan_samples_per_sec",
        "value": round(steps * bs / dt, 2), "unit": "samples/s",
        "vs_baseline": None,
        "steps_per_sec": round(steps / dt, 3), "batch": bs, "steps": steps,
        "split_frozen": split,
        "final_g_loss": round(g_loss, 4),
        "final_d_loss": round(float(metrics["d_loss"]), 4)}))


def bench_train():
    """Training-step throughput (samples/s) for one trainer family.

    Measures the REAL production program — xtts_tpu.train.cli's build_loss
    (frozen aux models included) under the generic pjit Trainer (grad +
    AdamW + global-norm clip, ttts/gpt/train_ms.py:221-237 semantics) — on
    synthetic batches at reference dataset shapes (gpt/dataset.py:72-74,
    diffusion/dataset.py:64-69, vqvae/dataset.py pad crop). Steps are
    dispatched back-to-back (throughput, not latency): only the final loss
    is fetched to the host, so the tunnel RTT is off the measured path.
    """
    import types

    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.train.cli import build_loss
    from xtts_tpu.train.trainer import Trainer

    family = os.environ.get("BENCH_TRAIN_FAMILY", "gpt")
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", 10))
    remat = os.environ.get("BENCH_REMAT", "none")
    defaults = {"gpt": 8, "vqvae": 64, "diffusion": 16, "clvp": 64,
                "classifier": 64, "hifigan": 8}
    if family not in defaults:
        raise SystemExit(f"BENCH_TRAIN_FAMILY={family!r}: "
                         f"use one of {sorted(defaults)}")
    bs = int(os.environ.get("BENCH_TRAIN_BS") or defaults[family])

    # BENCH_CONFIG: XTTSConfig JSON override (tiny configs for CPU smoke)
    cfg_path = os.environ.get("BENCH_CONFIG", "")
    cfg = XTTSConfig.from_json(cfg_path) if cfg_path else XTTSConfig()
    cfg = cfg.replace(train=cfg.train.replace(
        accum_grad=1, batch_size=bs, remat=remat, warmup_steps=10))
    args = types.SimpleNamespace(dvae_weights=None, gpt_weights=None)

    rng = np.random.default_rng(0)
    bins = cfg.mel.n_mels

    if family == "hifigan":
        return _bench_train_gan(cfg, args, bs, steps, rng)

    loss_fn, params, cols, ctx = build_loss(family, cfg, args)

    def mel(frames):
        return jnp.asarray(
            rng.standard_normal((bs, bins, frames)).astype(np.float32) * 0.1)

    # reference-scale shapes, clamped to the config's capacity tables so
    # tiny CPU-smoke configs don't trip the trainer's capacity guards
    # (no-ops on the real config)
    tlen = min(150, cfg.gpt.max_text_tokens - 4)
    vmax = min(250, cfg.gpt.number_text_tokens - 2)
    mlen = min(800, (cfg.gpt.max_mel_tokens - 4) * 4)
    text = jnp.asarray(rng.integers(3, vmax, (bs, tlen)).astype(np.int32))
    text_lens = jnp.full((bs,), tlen, jnp.int32)
    if family == "gpt":
        # 800-frame target mels -> 200 VQ codes; cond clip 400 frames
        batch = {"cond_mel": mel(min(400, mlen)), "text": text,
                 "text_lengths": text_lens, "mel": mel(mlen),
                 "wav_lengths": jnp.full((bs,), mlen * cfg.mel.hop_length,
                                         jnp.int32)}
    elif family == "vqvae":
        batch = {"mel": mel(min(200, mlen))}
    elif family == "diffusion":
        dlen = min(400, mlen)
        batch = {"mel": mel(dlen), "refer_mel": mel(min(304, dlen)),
                 "text": text, "text_lengths": text_lens,
                 "wav_lengths": jnp.full((bs,), dlen * cfg.mel.hop_length,
                                         jnp.int32)}
    elif family == "clvp":
        cl = min(250, cfg.clvp.speech_seq_len - 2)
        batch = {"text": text[:, :min(120, cfg.clvp.text_seq_len - 2)],
                 "codes": jnp.asarray(
                     rng.integers(0, min(8192, cfg.vqvae.num_tokens),
                                  (bs, cl)).astype(np.int32))}
    else:  # classifier
        batch = {"mel": jnp.swapaxes(mel(400), 1, 2),
                 "label": jnp.asarray(
                     rng.integers(0, 2, (bs,)).astype(np.int32))}

    # frozen aux params (diffusion: GPT+DVAE; gpt: DVAE) as runtime args of
    # the jitted step, NOT embedded HLO constants (remote-compile transport
    # root cause — PERF.md round 5)
    trainer = Trainer(loss_fn, cfg.train,
                      frozen=getattr(loss_fn, "frozen", None))
    state = trainer.init_state(params, cols or None)

    # BENCH_SPLIT_FROZEN=1 (diffusion): run the frozen GPT/DVAE latent
    # extraction as its OWN jitted program per step (same math, two
    # programs) — the fused step's compile exceeds the tunneled chip's
    # remote-compile ~28-30 min transport limit (PERF.md round 4). The
    # timed loop includes BOTH programs, so samples/s stays honest.
    split = (os.environ.get("BENCH_SPLIT_FROZEN", "0") == "1"
             and family == "diffusion")
    if split:
        from xtts_tpu.train.steps import diffusion_latent_fn
        latent_fn = diffusion_latent_fn(ctx["gpt"], ctx["gpt_vars"],
                                        ctx["dvae"], ctx["dvae_vars"])
        step_batch = lambda b_: {**b_, "latent": latent_fn(b_)}
    else:
        step_batch = lambda b_: b_

    key = jax.random.PRNGKey(0)
    state, metrics = trainer.step(state, step_batch(batch), key)   # compile
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer.step(state, step_batch(batch),
                                      jax.random.fold_in(key, i))
    loss = float(metrics["loss"])                       # one host sync at end
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"train_{family}_samples_per_sec",
        "value": round(steps * bs / dt, 2), "unit": "samples/s",
        "vs_baseline": None,               # reference publishes no train perf
        "steps_per_sec": round(steps / dt, 3), "batch": bs, "steps": steps,
        "remat": remat, "split_frozen": split, "final_loss": round(loss, 4)}))


def main():
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.models.gpt_infer import generate_speech

    max_gen = int(os.environ.get("BENCH_MAX_GEN", 300))
    diff_steps = int(os.environ.get("BENCH_DIFF_STEPS", 50))
    repeats = int(os.environ.get("BENCH_REPEATS", 5))
    path = os.environ.get("BENCH_PATH", "e2e")

    if path == "train":
        bench_train()
        return

    cfg = XTTSConfig()
    quant = os.environ.get("BENCH_QUANT", "1") == "1"
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
                       quantized_decode=quant,
                       with_hifigan=(path == "hifigan"))

    sr = cfg.mel.sample_rate
    cond_mel, text_tokens, cond_wav = synthetic_inputs(tts, cfg,
                                                       return_wav=True)

    # Speculative render (default on for the bench): bucket the render at
    # the max_gen cap and dispatch it without waiting for the generated
    # length — the lengths fetch then overlaps render execution, removing
    # one host-sync RTT from the critical path (interleaved in-process A/B:
    # -42.6 ms p50, PERF.md round 3). With max_gen=300 the cap lands in the
    # SAME code bucket as the generated 298, so program + inputs + wav are
    # bitwise identical to the non-speculative path
    # (tests/test_api_e2e.py::test_speculative_render_matches_default).
    # BENCH_SPECULATIVE=0 turns it off.
    spec = os.environ.get("BENCH_SPECULATIVE", "1") == "1"
    # unset -> "auto" (round-4 default: (128, 256) at >=16 AR rows, token-
    # exact 1.40x in the pipe_b16 A/B); BENCH_CACHE_LADDER=none forces
    # monolithic, a comma list forces those rungs
    _lad = os.environ.get("BENCH_CACHE_LADDER", "")
    if _lad == "":
        cache_ladder = "auto"
    elif _lad.lower() == "none":
        cache_ladder = None
    else:
        cache_ladder = tuple(int(x) for x in _lad.split(",") if x) or None
    # BENCH_KV_QUANT=1: int8 KV cache (scales folded into scores/probs) —
    # halves the serving-batch cache stream; needs BENCH_QUANT=1
    kv_quant = os.environ.get("BENCH_KV_QUANT", "0") == "1"
    # BENCH_REFNET_INTERVAL=k: sparse ReferenceNet hoist (cache every k-th
    # spaced timestep's features; 1 = exact reference semantics)
    refnet_k = int(os.environ.get("BENCH_REFNET_INTERVAL", "1"))
    # BENCH_COMPACT_ROWS=1,2,4,8: compacting decode waves — the serving AR
    # batch shrinks through these row buckets as rows finish
    # (infer/compact.py; segment boundaries = BENCH_CACHE_LADDER rungs or
    # the power-of-two default)
    _cr = os.environ.get("BENCH_COMPACT_ROWS", "")
    compact_rows = tuple(int(x) for x in _cr.split(",") if x) or None
    settings = TTSSettings(max_mel_tokens=max_gen, diffusion_steps=diff_steps,
                           speculative_render=spec,
                           cache_ladder=cache_ladder, kv_quant=kv_quant,
                           refnet_interval=refnet_k,
                           compact_rows=compact_rows)

    hop = cfg.mel.hop_length

    if path == "ar":
        # GPT mel-tokens/sec (BASELINE config #2)
        def run(key):
            if tts._qtree is not None:
                from xtts_tpu.infer.qdecode import (attach_fused_stack,
                                                    generate_speech_quantized)
                ov = os.environ.get("XTTS_FUSED_DECODE")
                fused = (ov == "1" if ov is not None
                         else jax.default_backend() == "tpu")
                if fused and "fused" not in tts._qtree:
                    attach_fused_stack(tts._qtree, cfg.gpt)
                res = generate_speech_quantized(
                    tts.gpt, tts.vars["gpt"], tts._qtree, cond_mel,
                    jnp.asarray(text_tokens), key, max_gen=max_gen,
                    do_sample=False, use_fused=fused,
                    cache_ladder=None if cache_ladder == "auto"
                    else cache_ladder)
            else:
                res = generate_speech(
                    tts.gpt, tts.vars["gpt"], cond_mel,
                    jnp.asarray(text_tokens), key, max_gen=max_gen,
                    do_sample=False,
                    cache_ladder=None if cache_ladder == "auto"
                    else cache_ladder)
            jax.block_until_ready(res.codes)
            return int(res.steps)

        run(jax.random.PRNGKey(0))  # compile
        t0 = time.perf_counter()
        steps = 0
        for i in range(repeats):
            steps += run(jax.random.PRNGKey(i))
        dt = time.perf_counter() - t0
        tps = steps / dt
        audio_per_tok = cfg.gpt.mel_length_compression / sr  # 42.7 ms/code
        rtf = 1.0 / (tps * audio_per_tok)
        print(json.dumps({
            "metric": "gpt_ar_mel_tokens_per_sec", "value": round(tps, 2),
            "unit": "tokens/s",
            "vs_baseline": round(TARGET_RTF / rtf, 4)}))
        return

    if path in ("vqvae", "vocos"):
        # BASELINE configs #1/#3: subsystem throughput in audio-s/s. The
        # fidelity halves of these configs (mel-L1 parity, bit-exact VQ
        # codes) are pinned by the golden suite (tests/test_reference_parity
        # .py, tests/test_torch_parity.py) — this measures speed only.
        b = int(os.environ.get("BENCH_BATCH", 8))
        frames = 1504                     # ~16 s of audio per row at hop 256
        mel = jnp.asarray(np.random.default_rng(1).standard_normal(
            (b, cfg.mel.n_mels, frames)).astype(np.float32))

        if path == "vqvae":
            def prog(dvars, mel):
                codes = tts.dvae.apply(dvars, mel,
                                       method=tts.dvae.get_codebook_indices)
                rec, _ = tts.dvae.apply(dvars, codes, method=tts.dvae.decode)
                return rec
            fn = jax.jit(prog)
            args = (tts.vars["dvae"], mel)
        else:
            fn = jax.jit(tts.vocos.apply)
            args = (tts.vars["vocos"], mel)

        jax.block_until_ready(fn(*args))          # compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        audio_s = repeats * b * frames * cfg.mel.hop_length / sr
        thr = audio_s / dt
        print(json.dumps({
            "metric": f"{path}_audio_s_per_s_per_chip",
            "value": round(thr, 1), "unit": "audio_s/s",
            "vs_baseline": round(thr * TARGET_RTF, 4),
            "batch": b, "frames": frames}))
        return

    if path == "serving":
        # batched serving throughput (BASELINE config #5: "batched serving
        # w/ KV-cache paging + CLVP rerank"). Headline = the FULL-QUALITY
        # path: B utterances x K CLVP-reranked candidates through one AR
        # program, winners through the 50-step CFG diffusion (hoisted
        # all-step ReferenceNet) + Vocos — the test.py-equivalent render.
        # The dvae-decode shortcut number is reported alongside.
        from xtts_tpu.infer.serving import SynthesisRequest, synthesize_batch
        b = int(os.environ.get("BENCH_BATCH", 8))
        k_cand = int(os.environ.get("BENCH_RERANK_K", 2))
        if os.environ.get("BENCH_MIXED_TEXT", "0") == "1":
            # BENCH_MIXED_TEXT=1: rows carry DIFFERENT texts of varied
            # lengths (20..50 tokens) so generation lengths decorrelate —
            # the traffic shape where compacting waves pay off (real
            # serving batches mix short and long utterances)
            mrng = np.random.default_rng(7)
            lens = np.linspace(20, text_tokens.shape[1], b).astype(int)
            reqs = [SynthesisRequest(
                mrng.integers(3, 250, (int(n),)).astype(np.int32))
                for n in lens]
        else:
            reqs = [SynthesisRequest(text_tokens[0]) for _ in range(b)]
        if k_cand > 1 and tts.clvp is None:
            from xtts_tpu.models.clvp import CLVP
            tts.clvp = CLVP(cfg.clvp, dtype=jnp.bfloat16)
            tts.vars["clvp"] = jax.jit(tts.clvp.init)(
                jax.random.PRNGKey(5), jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 8), jnp.int32))
        quality = TTSSettings(max_mel_tokens=max_gen,
                              diffusion_steps=diff_steps,
                              num_candidates=k_cand,
                              cache_ladder=cache_ladder, kv_quant=kv_quant,
                              refnet_interval=refnet_k,
                              compact_rows=compact_rows)

        def run_srv(key, use_diffusion, s):
            wavs = synthesize_batch(tts, reqs, cond_mel, s,
                                    use_diffusion=use_diffusion, key=key)
            return sum(w.size for w in wavs) / sr

        def throughput(use_diffusion, s):
            run_srv(jax.random.PRNGKey(99), use_diffusion, s)  # compile
            t0 = time.perf_counter()
            audio = 0.0
            for i in range(repeats):
                audio += run_srv(jax.random.PRNGKey(i), use_diffusion, s)
            return audio / (time.perf_counter() - t0)

        thr_shortcut = throughput(False, settings)
        thr_full = throughput(True, quality)
        print(json.dumps({
            "metric": "serving_full_quality_audio_s_per_s_per_chip",
            "value": round(thr_full, 2), "unit": "audio_s/s",
            "vs_baseline": round(thr_full * TARGET_RTF, 4),
            "rerank_k": k_cand, "diffusion_steps": diff_steps,
            "batch": b,
            "shortcut_audio_s_per_s": round(thr_shortcut, 2)}))
        return

    if path == "slots":
        # continuous batching (infer/slots.py): steady-state drain of N
        # mixed-length requests through a BENCH_BATCH-slot pool with
        # mid-stream refill + batched full-diffusion renders. Random-weight
        # rows mostly run to the cap, so this measures the machinery's
        # sustained throughput; the refill win over waves on spread stop
        # times is scripts/ab_slots.py (stop-biased).
        from xtts_tpu.infer.slots import ContinuousBatcher
        b = int(os.environ.get("BENCH_BATCH", 8))
        n_req = int(os.environ.get("BENCH_SLOTS_N", 3 * b))
        mrng = np.random.default_rng(7)
        lens = np.linspace(20, text_tokens.shape[1], n_req).astype(int)
        texts = [mrng.integers(3, 250, (int(n),)).astype(np.int32)
                 for n in lens]
        cb = ContinuousBatcher(tts, cond_mel, settings, n_slots=b,
                               use_diffusion=True, render_min=max(2, b // 2))
        futs = [cb.submit(t) for t in texts[:b]]      # compile pass
        for f in futs:
            f.result()
        t0 = time.perf_counter()
        futs = [cb.submit(t) for t in texts]
        audio = sum(f.result().size for f in futs) / sr
        dt = time.perf_counter() - t0
        cb.close()
        thr = audio / dt
        print(json.dumps({
            "metric": "slots_full_quality_audio_s_per_s_per_chip",
            "value": round(thr, 2), "unit": "audio_s/s",
            "vs_baseline": round(thr * TARGET_RTF, 4),
            "n_slots": b, "n_requests": n_req,
            "diffusion_steps": diff_steps}))
        return

    if path == "hifigan":
        # XTTS-v2-style alternative render (hifigan_vocoder.py:655-771):
        # AR decode -> teacher-forced latent -> HifiDecoder waveform. No
        # diffusion loop — the latency floor of the latent-direct path.
        spk = tts.speaker_mel_from_wav(cond_wav)
        out_sr = cfg.hifigan.output_sample_rate

        def run_h(key):
            return tts.tts_tokens(text_tokens, cond_mel, key, settings,
                                  use_hifigan=True, spk_mel16=spk)

        for i in range(repeats):
            run_h(jax.random.PRNGKey(i))          # compile all buckets
        times, rtfs = [], []
        for i in range(repeats):
            t0 = time.perf_counter()
            out = run_h(jax.random.PRNGKey(i))
            dt = time.perf_counter() - t0
            times.append(dt)
            rtfs.append(dt / max(out["wav"].shape[1] / out_sr, 1e-9))
        rtf = float(np.median(rtfs))
        print(json.dumps({
            "metric": "hifigan_e2e_rtf_per_chip",
            "value": round(rtf, 4), "unit": "wall_s_per_audio_s",
            "vs_baseline": round(TARGET_RTF / rtf, 4),
            "p50_latency_s": round(float(np.percentile(times, 50)), 3),
            "repeats": repeats}))
        return

    def run_e2e(key):
        out = tts.tts_tokens(text_tokens, cond_mel, key, settings,
                             use_diffusion=True)
        return out

    # compile pass: run every timed key once untimed so all shape buckets
    # (code-length ladder) are compiled before measurement
    for i in range(repeats):
        run_e2e(jax.random.PRNGKey(i))

    # median-of-N with per-utterance latency percentiles (BASELINE.md tracks
    # p50 utterance latency; tunnel RTF jitter is ~±15%, so single
    # measurements are not defensible — PERF.md)
    times, rtfs = [], []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = run_e2e(jax.random.PRNGKey(i))
        dt = time.perf_counter() - t0
        times.append(dt)
        rtfs.append(dt / max(out["wav"].shape[1] / sr, 1e-9))

    rtf = float(np.median(rtfs))
    print(json.dumps({
        "metric": "e2e_rtf_per_chip",
        "value": round(rtf, 4),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(TARGET_RTF / rtf, 4),
        "p50_latency_s": round(float(np.percentile(times, 50)), 3),
        "p90_latency_s": round(float(np.percentile(times, 90)), 3),
        "rtf_mean": round(float(np.mean(rtfs)), 4),
        "rtf_std": round(float(np.std(rtfs)), 4),
        "repeats": repeats,
    }))


if __name__ == "__main__":
    main()
