"""Real-weights quality runbook: one command from checkpoints to verdicts.

Every quality question this framework deferred to "the day real weights
appear" (PERF.md phases 6/14; VERDICT r4 missing #2) answers itself here:

  1. convert     reference torch .pth dir -> native npz model dir
                 (examples/convert_checkpoints.py; skipped when --src is
                 omitted and --model-dir already holds npz weights)
  2. vq_parity   bit-exact VQ codes + recon mel-L1 of OUR DVAE vs the
                 reference's own torch DiscreteVAE running the converted
                 .pth (BASELINE.md fidelity axis; needs torch + the
                 reference repo importable — auto-skipped otherwise)
  3. quant_gates quantization_quality_gate verdicts for the lossy decode
                 engines: int8 weights, int4 weights, int8 KV cache
                 (policy: >= 0.98 teacher-forced greedy agreement before
                 an engine may become a default — infer/qdecode.py:364)
  4. steps_dial  render divergence of the reference's fewer-step presets
                 (50 -> 30/20: wav relL2, mel L1, MCD) — the speed side
                 measured 1.294x/1.539x at B=16 (PERF.md phase 14)
  5. refnet_dial render divergence of refnet_interval k=3/5 (speed side:
                 1.155x at k=5, PERF.md phase 6)

Output: <model_dir>/quality_report.json + a human summary. Each stage is
independent; failures/missing deps mark the stage "skipped" with a reason
rather than aborting the run.

Usage:
  # from reference torch checkpoints (gpt.pth, dvae.pth, diffusion.pth...):
  python scripts/quality_on_real.py --src /path/to/ref_ckpts --model-dir ./m
  # from an already-converted model dir:
  python scripts/quality_on_real.py --model-dir ./m
Options: --config cfg.json  --wav ref.wav  --max-gen N  --steps 30,20
         --refnet-ks 3,5  --report out.json  --platform cpu|tpu
Smoke-tested end-to-end on random-init tiny checkpoints by
tests/test_quality_on_real.py.
"""
import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _render_metrics(mel_fn, base_out, out):
    """wav relL2 / mel L1 / MCD between two renders of the same codes."""
    import numpy as np
    from xtts_tpu.infer.eval_tools import mcd, mel_l1
    w0 = np.asarray(base_out["wav"], np.float64).reshape(-1)
    w1 = np.asarray(out["wav"], np.float64).reshape(-1)
    n = min(w0.size, w1.size)
    rel = float(np.linalg.norm(w1[:n] - w0[:n])
                / max(np.linalg.norm(w0[:n]), 1e-12))
    return {"wav_rel_l2": rel,
            "mel_l1": mel_l1(mel_fn, w0[:n], w1[:n]),
            "mcd_db": mcd(mel_fn, w0[:n], w1[:n])}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="real-weights quality runbook (see module docstring)")
    ap.add_argument("--src", default=None,
                    help="dir of reference torch .pth files (optional; "
                         "converted into --model-dir first)")
    ap.add_argument("--model-dir", required=True,
                    help="native model dir (created by conversion, or "
                         "pre-existing npz + xtts_config.json)")
    ap.add_argument("--config", default=None, help="XTTSConfig json override")
    ap.add_argument("--wav", default=None,
                    help="reference audio for the cond mel (default: the "
                         "bench's synthetic 3 s clip)")
    ap.add_argument("--max-gen", type=int, default=300)
    ap.add_argument("--base-steps", type=int, default=50)
    ap.add_argument("--steps", default="30,20",
                    help="comma list for the steps dial ('' disables)")
    ap.add_argument("--refnet-ks", default="3,5",
                    help="comma list for the refnet dial ('' disables)")
    ap.add_argument("--gates", default="int8,int4,kvq",
                    help="subset of int8,int4,kvq ('' disables)")
    ap.add_argument("--report", default=None,
                    help="report path (default <model-dir>/quality_report"
                         ".json)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for a smoke run)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    report = {"model_dir": os.path.abspath(args.model_dir), "stages": {}}

    def stage(name, result):
        report["stages"][name] = result
        tag = ("SKIP" if result.get("skipped")
               else ("FAIL" if result.get("passed") is False else "ok"))
        print(f"[{tag}] {name}: "
              f"{result.get('reason', json.dumps(result, default=str)[:200])}",
              flush=True)

    # ---- 1. convert ------------------------------------------------------
    if args.src:
        cmd = [sys.executable, os.path.join(REPO, "examples",
                                            "convert_checkpoints.py"),
               "--src", args.src, "--dst", args.model_dir]
        if args.config:
            cmd += ["--config", args.config]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True)
        print(r.stdout, end="", flush=True)
        if r.returncode != 0:
            print(r.stderr, end="", file=sys.stderr)
            stage("convert", {"passed": False, "reason": "converter failed; "
                              "see stderr", "rc": r.returncode})
            # nothing loadable was produced — stop here with the report
            _write(report, args)
            return 1
        stage("convert", {"src": os.path.abspath(args.src),
                          "seconds": round(time.time() - t0, 1)})
    else:
        stage("convert", {"skipped": True,
                          "reason": "--src not given; using --model-dir "
                                    "as-is"})

    # ---- 2. load ---------------------------------------------------------
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    cfg = XTTSConfig.from_json(args.config) if args.config else None
    tts = TextToSpeech.from_pretrained(args.model_dir, cfg=cfg,
                                       dtype=jnp.bfloat16,
                                       quantized_decode=True)
    cfg = tts.cfg

    if args.wav:
        from xtts_tpu.data.audio import load_wav
        cond_wav, _ = load_wav(args.wav, cfg.mel.sample_rate)
        cond_mel = tts.cond_mel_from_wav(cond_wav)
        rng = np.random.default_rng(0)
        tl = min(50, cfg.gpt.max_text_tokens - 4)
        text_tokens = rng.integers(
            3, cfg.gpt.number_text_tokens - 6, (1, tl)).astype(np.int32)
    else:
        from bench import synthetic_inputs
        tl = min(50, cfg.gpt.max_text_tokens - 4)
        cond_mel, text_tokens = synthetic_inputs(tts, cfg, text_len=tl)
    tmax = cfg.diffusion.clip.max_patches * cfg.diffusion.clip.patch_size
    if cond_mel.shape[-1] > tmax:
        cond_mel = cond_mel[:, :, :tmax]
    stage("load", {"models": sorted(tts.vars)})

    # ---- 3. vq_parity (ours vs the reference's own torch DVAE) -----------
    vq_pth = None
    for stem in ("vqvae", "dvae"):
        for ext in (".pth", ".pt", ".bin"):
            p = os.path.join(args.src or "", stem + ext)
            if args.src and os.path.exists(p):
                vq_pth = p
    if vq_pth is None:
        stage("vq_parity", {"skipped": True,
                            "reason": "needs --src with a vqvae/dvae .pth"})
    else:
        try:
            sys.path.insert(0, os.path.join(REPO, "tests"))
            from ref_stubs import install_reference_stubs
            install_reference_stubs()
            import torch
            from ttts.vqvae.xtts_dvae import DiscreteVAE
            v = cfg.vqvae
            ref = DiscreteVAE(
                positional_dims=1, num_tokens=v.num_tokens,
                codebook_dim=v.codebook_dim, num_layers=v.num_layers,
                num_resnet_blocks=v.num_resnet_blocks,
                hidden_dim=v.hidden_dim, channels=v.channels,
                stride=v.stride, kernel_size=v.kernel_size,
                use_transposed_convs=v.use_transposed_convs,
                activation=v.activation, smooth_l1_loss=v.smooth_l1_loss,
                ssim_loss_weight=v.ssim_loss_weight).eval()
            from xtts_tpu.utils.convert import load_torch_checkpoint
            ref.load_state_dict(
                {k: torch.as_tensor(np.asarray(t))
                 for k, t in load_torch_checkpoint(vq_pth).items()},
                strict=False)
            mel = np.asarray(cond_mel, np.float32)
            mel = mel[..., : mel.shape[-1] // (2 ** v.num_layers)
                      * (2 ** v.num_layers)]
            with torch.no_grad():
                want = ref.get_codebook_indices(
                    torch.from_numpy(mel)).numpy()
                rec_t = ref.decode(torch.from_numpy(want))[0].numpy()
            got = np.asarray(tts.dvae.apply(
                tts.vars["dvae"], jnp.asarray(mel),
                method=tts.dvae.get_codebook_indices))
            rec_j, _ = tts.dvae.apply(tts.vars["dvae"], jnp.asarray(got),
                                      method=tts.dvae.decode)
            agree = float((want == got).mean())
            l1 = float(np.abs(np.asarray(rec_j) - rec_t).mean())
            stage("vq_parity", {"code_agreement": agree,
                                "codes_bit_exact": bool(agree == 1.0),
                                "recon_mel_l1_vs_torch": l1,
                                "n_codes": int(want.size),
                                "passed": agree == 1.0 and l1 < 1e-3})
        except Exception as e:  # torch/reference missing, shape mismatch...
            stage("vq_parity", {"skipped": True,
                                "reason": f"{type(e).__name__}: {e}"})

    # ---- generate once: codes for the gates + the exact base render ------
    key = jax.random.PRNGKey(7)
    base_settings = TTSSettings(max_mel_tokens=args.max_gen,
                                diffusion_steps=args.base_steps)
    t0 = time.time()
    base_out = tts.tts_tokens(text_tokens, cond_mel, key, base_settings,
                              use_diffusion=True, return_intermediates=True)
    codes = np.asarray(base_out["codes"])[:, :int(base_out["lengths"][0])]
    stage("generate", {"n_codes": int(codes.shape[1]),
                       "audio_s": round(base_out["wav"].shape[1]
                                        / cfg.mel.sample_rate, 2),
                       "seconds": round(time.time() - t0, 1)})

    # ---- 4. quant gates ---------------------------------------------------
    gates = [g for g in args.gates.split(",") if g]
    if not gates:
        stage("quant_gates", {"skipped": True, "reason": "--gates ''"})
    else:
        from xtts_tpu.infer.qdecode import quantization_quality_gate
        spec = {"int8": dict(bits=8), "int4": dict(bits=4),
                "kvq": dict(bits=8, kv_quant=True)}
        res = {}
        for g in gates:
            if g not in spec:
                res[g] = {"skipped": True, "reason": f"unknown gate {g!r}"}
                continue
            r = quantization_quality_gate(
                tts.gpt, tts.vars["gpt"], cond_mel, text_tokens,
                jnp.asarray(codes), **spec[g])
            res[g] = r
        stage("quant_gates",
              {**res, "passed": all(r.get("passed", True)
                                    for r in res.values()
                                    if not r.get("skipped"))})

    # ---- 5/6. render dials (same codes -> pure render effect) ------------
    mel_fn = tts.mel

    def dial(name, values, make_settings):
        if not values:
            stage(name, {"skipped": True, "reason": "disabled"})
            return
        out = {}
        for v in values:
            o = tts.tts_tokens(text_tokens, cond_mel, key, make_settings(v),
                               use_diffusion=True, return_intermediates=True)
            out[str(v)] = _render_metrics(mel_fn, base_out, o)
        stage(name, out)

    dial("steps_dial",
         [int(s) for s in args.steps.split(",") if s],
         lambda s: TTSSettings(max_mel_tokens=args.max_gen,
                               diffusion_steps=s))
    dial("refnet_dial",
         [int(k) for k in args.refnet_ks.split(",") if k],
         lambda k: TTSSettings(max_mel_tokens=args.max_gen,
                               diffusion_steps=args.base_steps,
                               refnet_interval=k))

    _write(report, args)
    return 0


def _write(report, args):
    path = args.report or os.path.join(args.model_dir, "quality_report.json")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"report -> {path}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
