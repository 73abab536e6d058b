"""Phase-13 diagnosis: why did the forward-only diffusion latent program
break the remote-compile transport (4/4 Broken pipe, PERF.md phase 13)
when the bigger GPT fwd+bwd step compiles in ~3 min?

Bisection, each stage timed and compiled AOT (lower -> compile) so compile
time is separated from execution:

  1. dvae_codes   frozen DVAE get_codebook_indices alone (Pallas VQ argmin)
  2. gpt_latent   frozen GPT teacher-forced forward, return_latent=True,
                  codes as an INPUT (no DVAE in the program)
  3. latent_fn    the real fused frozen program (DVAE -> GPT -> mask),
                  exactly train/steps.py:diffusion_latent_fn
  4. (optional, DIAG_STEP=1) the full diffusion train step with
     batch['latent'] precomputed — the split-frozen second program

Shapes mirror BENCH_PATH=train BENCH_TRAIN_FAMILY=diffusion (bench.py):
bs from DIAG_BS (default 16), mel 400 frames, text 150 tokens.

Run:  timeout 2100 python scripts/diag_latent_compile.py [stage ...]
      (stages default to "dvae_codes gpt_latent latent_fn")
Each stage prints jaxpr size, lowering time, compile time. A stage that
hangs is the culprit; run stages individually to isolate.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def time_compile(tag, fn, *args):
    """AOT lower+compile with separate timings; returns compile seconds."""
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    n_eqns = str(lowered.as_text()).count("\n")
    log(f"{tag}: lowered in {t_lower:.1f}s, stablehlo ~{n_eqns} lines; "
        f"compiling ...")
    t0 = time.time()
    compiled = lowered.compile()
    t_comp = time.time() - t0
    log(f"{tag}: COMPILED in {t_comp:.1f}s")
    # one execution so the result is real end-to-end
    t0 = time.time()
    out = compiled(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    log(f"{tag}: executed in {time.time() - t0:.1f}s (sum={s:.3e})")
    return {"lower_s": round(t_lower, 1), "compile_s": round(t_comp, 1),
            "hlo_lines": n_eqns}


def main():
    stages = sys.argv[1:] or ["dvae_codes", "gpt_latent", "latent_fn"]
    bs = int(os.environ.get("DIAG_BS", "16"))

    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.train.cli import build_loss
    import types
    cfg = XTTSConfig()
    cfg = cfg.replace(train=cfg.train.replace(accum_grad=1, batch_size=bs))
    args = types.SimpleNamespace(dvae_weights=None, gpt_weights=None)
    log(f"building diffusion ctx (bs={bs}) on "
        f"{jax.devices()[0].platform} ...")
    t0 = time.time()
    loss_fn, params, cols, ctx = build_loss("diffusion", cfg, args)
    gpt, gpt_vars = ctx["gpt"], ctx["gpt_vars"]
    dvae, dvae_vars = ctx["dvae"], ctx["dvae_vars"]
    log(f"ctx built in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    bins = cfg.mel.n_mels
    dlen = 400
    mel = jnp.asarray(rng.standard_normal((bs, bins, dlen)).astype(np.float32) * 0.1)
    refer = jnp.asarray(rng.standard_normal((bs, bins, 304)).astype(np.float32) * 0.1)
    tlen = 150
    text = jnp.asarray(rng.integers(3, 250, (bs, tlen)).astype(np.int32))
    text_lens = jnp.full((bs,), tlen, jnp.int32)
    wav_lens = jnp.full((bs,), dlen * cfg.mel.hop_length, jnp.int32)
    batch = {"mel": mel, "refer_mel": refer, "text": text,
             "text_lengths": text_lens, "wav_lengths": wav_lens}

    results = {}
    for stage in stages:
        if stage == "dvae_codes":
            def codes_of(mel_):
                return dvae.apply(dvae_vars, mel_,
                                  method=dvae.get_codebook_indices)
            results[stage] = time_compile(stage, codes_of, mel)
        elif stage in ("gpt_latent", "gpt_latent_bf16"):
            # _bf16: same params (f32), bf16 COMPUTE module — discriminates
            # the dtype hypothesis: build_loss("gpt")'s trained GPT is bf16
            # and compiled in ~3 min (PERF.md r4), while every transport-
            # killed latent program wraps the frozen f32 GPT.
            g = gpt
            if stage.endswith("_bf16"):
                from xtts_tpu.utils.registry import load_model
                g, _ = load_model("gpt", cfg, dtype=jnp.bfloat16)
            codes = jnp.asarray(
                rng.integers(0, 8192, (bs, dlen // 4)).astype(np.int32))

            def latent_of_codes(codes_, g=g):
                lat = g.apply(gpt_vars, refer, text, text_lens, codes_,
                              wav_lens, return_latent=True)
                return jnp.swapaxes(lat, 1, 2)
            results[stage] = time_compile(stage, latent_of_codes, codes)
        elif stage == "latent_fn":
            from xtts_tpu.train.steps import diffusion_latent_fn
            fn = diffusion_latent_fn(gpt, gpt_vars, dvae, dvae_vars,
                                     jit=False)
            results[stage] = time_compile(stage, fn, batch)
        elif stage == "train_step":
            from xtts_tpu.train.steps import diffusion_latent_fn
            from xtts_tpu.train.trainer import Trainer
            lat = diffusion_latent_fn(gpt, gpt_vars, dvae, dvae_vars)(batch)
            trainer = Trainer(loss_fn, cfg.train)
            state = trainer.init_state(params, cols or None)
            b2 = {**batch, "latent": lat}
            t0 = time.time()
            state, metrics = trainer.step(state, b2, jax.random.PRNGKey(0))
            log(f"train_step: first step (compile+run) "
                f"{time.time() - t0:.1f}s loss={float(metrics['loss']):.4f}")
            results[stage] = {"first_step_s": round(time.time() - t0, 1)}
        else:
            log(f"unknown stage {stage!r}")
    print(json.dumps({"bs": bs, "stages": results}))


if __name__ == "__main__":
    main()
