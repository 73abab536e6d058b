"""Zero-shot synthesis CLI — the runnable equivalent of the reference's
root-level test.py (hard-coded-path demo script).

    python examples/synthesize.py --text "你好，世界。" \
        --ref-wav speaker.wav --out gen.wav \
        [--weights exp/release_dir] [--preset fast] [--shortcut] [--int8]

With no --weights the models are randomly initialized (pipeline smoke run:
the output is noise-shaped audio, useful for timing/integration checks).
"""
from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--text", required=True)
    ap.add_argument("--ref-wav", required=True, nargs="+",
                    help="reference speaker wav(s); several clips average "
                         "the conditioning latents (ttts/api.py:225-240)")
    ap.add_argument("--out", default="gen.wav")
    ap.add_argument("--lang", default="ZH", choices=["ZH", "EN", "JA"])
    ap.add_argument("--weights", default=None,
                    help="directory for TextToSpeech.from_pretrained")
    ap.add_argument("--preset", default=None,
                    choices=["ultra_fast", "fast", "standard", "high_quality"])
    ap.add_argument("--steps", type=int, default=50, help="diffusion steps")
    ap.add_argument("--sampler", default="p",
                    choices=["p", "ddim", "dpm++2m", "unipc"])
    ap.add_argument("--shortcut", action="store_true",
                    help="DVAE-decode render (skip diffusion) — fastest")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only AR decode engine")
    ap.add_argument("--hifigan", action="store_true",
                    help="HifiDecoder latent->wav render (XTTS-v2 style; "
                         "skips diffusion+vocos)")
    ap.add_argument("--stream", action="store_true",
                    help="stream per-sentence chunks (prints time-to-first-"
                         "audio); output wav is identical to the "
                         "non-batched path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from xtts_tpu.data.audio import load_wav, save_wav
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech

    if args.preset:
        settings = TTSSettings.preset(args.preset)
    else:
        settings = TTSSettings(diffusion_steps=args.steps,
                               sampler=args.sampler)

    t0 = time.perf_counter()
    if args.weights:
        tts = TextToSpeech.from_pretrained(args.weights,
                                           quantized_decode=args.int8,
                                           with_hifigan=args.hifigan)
    else:
        print("NOTE: no --weights; random init (noise output, timing only)")
        tts = TextToSpeech(rng=jax.random.PRNGKey(args.seed),
                           quantized_decode=args.int8,
                           with_hifigan=args.hifigan)
    print(f"models ready in {time.perf_counter() - t0:.1f}s")

    refs = [load_wav(p, tts.cfg.mel.sample_rate)[0] for p in args.ref_wav]
    ref = refs[0] if len(refs) == 1 else refs
    t0 = time.perf_counter()
    if args.stream:
        chunks = []
        for i, w in enumerate(tts.tts_stream(
                args.text, ref, jax.random.PRNGKey(args.seed), settings,
                lang=args.lang, use_diffusion=not args.shortcut,
                use_hifigan=args.hifigan)):
            if i == 0:
                print(f"time-to-first-audio: "
                      f"{time.perf_counter() - t0:.2f}s")
            chunks.append(w)
        wav = (np.concatenate(chunks) if chunks
               else np.zeros(0, np.float32))
    else:
        wav = tts.tts(args.text, ref, jax.random.PRNGKey(args.seed),
                      settings, lang=args.lang,
                      use_diffusion=not args.shortcut,
                      use_hifigan=args.hifigan)
    dt = time.perf_counter() - t0
    dur = wav.size / tts.cfg.mel.sample_rate
    save_wav(args.out, wav, tts.cfg.mel.sample_rate)
    print(f"wrote {args.out}: {dur:.2f}s audio in {dt:.2f}s "
          f"(RTF {dt / max(dur, 1e-9):.4f})")


if __name__ == "__main__":
    main()
