"""Corpus preparation CLI — orchestrates the full prepare pipeline
(ttts/prepare/ scripts + ttts/train_step.py ordering):

    python examples/prepare_corpus.py --wav-dir raw/ --out-dir corpus/ \
        [--vad] [--dvae-weights exp/vqvae.npz]

Stages: [VAD split] -> ASR (inject your backend, see --help) -> text clean
-> filelist -> mel cache -> [VQ cache] -> BPE corpus (+ optional tokenizer).
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--lang", default="ZH")
    ap.add_argument("--vad", action="store_true",
                    help="split long recordings on silence first")
    ap.add_argument("--transcripts", default=None,
                    help="existing {path,text} jsonl (skip ASR)")
    ap.add_argument("--dvae-weights", default=None,
                    help="also cache VQ codes with this DVAE (.npz)")
    ap.add_argument("--train-tokenizer", action="store_true")
    args = ap.parse_args()

    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.data import prepare
    from xtts_tpu.dsp.mel import MelFrontend

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = XTTSConfig()
    wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))
    print(f"{len(wavs)} wavs in {args.wav_dir}")

    if args.vad:
        clips = []
        for w in wavs:
            clips += prepare.vad_split_file(
                w, os.path.join(args.out_dir, "clips"),
                cfg.mel.sample_rate)
        print(f"VAD: {len(clips)} clips")
        wavs = clips

    jsonl = os.path.join(args.out_dir, "transcripts.jsonl")
    if args.transcripts:
        jsonl = args.transcripts
    elif not os.path.exists(jsonl):
        raise SystemExit(
            "No ASR backend in this environment: provide --transcripts "
            "jsonl, or call prepare.vad_asr_to_jsonl(wavs, out, asr_fn=...) "
            "with your FunASR/whisper wrapper "
            "(reference: ttts/prepare/asr_process.py)")
    records = [json.loads(l) for l in open(jsonl, encoding="utf-8")]

    filelist = os.path.join(args.out_dir, "filelist.txt")
    entries = prepare.preprocess_text(records, filelist, args.lang)
    print(f"filelist: {len(entries)} entries -> {filelist}")

    mel_fn = MelFrontend(cfg.mel)
    n = prepare.cache_mels([e.wav_path for e in entries], mel_fn,
                           cfg.mel.sample_rate)
    print(f"mel cache: {n} new")

    if args.dvae_weights:
        import jax
        from xtts_tpu.utils.registry import load_model
        dvae, dv = load_model("vqvae", cfg, weights_path=args.dvae_weights)
        # vars as a jit ARG, not a ~206 MB embedded constant (PERF.md r5)
        _codes_impl = jax.jit(lambda dv_, mel: dvae.apply(
            dv_, mel, method=dvae.get_codebook_indices))
        codes_fn = lambda mel: _codes_impl(dv, mel)
        n = prepare.cache_vq_codes([e.wav_path for e in entries], codes_fn)
        print(f"VQ cache: {n} new")

    corpus = os.path.join(args.out_dir, "bpe_corpus.txt")
    prepare.build_bpe_corpus(entries, corpus)
    if args.train_tokenizer:
        tok_path = os.path.join(args.out_dir, "tokenizer.json")
        prepare.train_bpe_from_corpus(corpus, tok_path)
        print(f"tokenizer -> {tok_path}")
    print("done")


if __name__ == "__main__":
    main()
