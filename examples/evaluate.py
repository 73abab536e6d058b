"""Offline DVAE/vocoder evaluation over a filelist.

The reference's offline eval tools are ttts/vqvae/inference.py:31-115
(recon loss + VQ code dump + optional wav renders over a filelist) and
ttts/api_zh.py:25-47 (single-clip round-trip demo). This CLI wraps
xtts_tpu.infer.eval_tools.evaluate_dvae: per-clip mel-L1, codebook usage,
optional Vocos renders of the reconstructions, one summary JSON line.

  python examples/evaluate.py --filelist eval.txt \
      --dvae-weights model/vqvae.npz [--vocos-weights model/vocos.npz \
      --wav-dir out/] [--out-jsonl per_clip.jsonl] [--limit 100]

Filelist lines: either bare paths (wav or cached .mel.npy) or the 6-field
`key|wav|spk|lang|raw|cleaned` format (wav taken from field 2).
"""
import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--config", default=None, help="XTTSConfig JSON")
    ap.add_argument("--dvae-weights", default=None,
                    help=".npz or reference .pth (random init if omitted)")
    ap.add_argument("--vocos-weights", default=None,
                    help="render reconstructions via Vocos (needs --wav-dir)")
    ap.add_argument("--wav-dir", default=None)
    ap.add_argument("--out-jsonl", default=None, help="per-clip records")
    ap.add_argument("--limit", type=int, default=0, help="0 = all")
    args = ap.parse_args(argv)

    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.dsp.mel import MelFrontend
    from xtts_tpu.infer.eval_tools import evaluate_dvae
    from xtts_tpu.utils.registry import load_model

    cfg = XTTSConfig.from_json(args.config) if args.config else XTTSConfig()
    paths = []
    with open(args.filelist) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            paths.append(line.split("|")[1] if "|" in line else line)
    if args.limit:
        paths = paths[: args.limit]

    dvae, dvae_vars = load_model("vqvae", cfg,
                                 weights_path=args.dvae_weights)
    vocos = vocos_vars = None
    if args.vocos_weights:
        vocos, vocos_vars = load_model("vocos", cfg,
                                       weights_path=args.vocos_weights)

    summary = evaluate_dvae(
        dvae, dvae_vars, paths, out_jsonl=args.out_jsonl,
        vocos=vocos, vocos_vars=vocos_vars, wav_dir=args.wav_dir,
        sample_rate=cfg.mel.sample_rate, mel_fn=MelFrontend(cfg.mel))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
