"""Convert reference torch checkpoints into a native xtts_tpu model dir.

The reference ships per-model .pth files (README.md:10 links gpt/vqvae/
diffusion/clvp checkpoints; vocos comes from charactr/vocos-mel-24khz).
This CLI maps each torch state dict through the registered converter
(xtts_tpu/utils/convert.py) once and writes flat .npz trees +
xtts_config.json, so TextToSpeech.from_pretrained(dst) loads natively
with no torch dependency at inference time.

Usage:
    python examples/convert_checkpoints.py --src /path/to/ref_ckpts \
        --dst ./model_dir [--config xtts_config.json]

Source file discovery per model <name> in {gpt, vqvae, diffusion, vocos,
clvp, hifigan, classifier}: first match of <name>.pth/.pt/.bin or
<alias>.* (dvae for vqvae). Missing files are skipped with a note.
"""
import argparse
import glob
import os
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="dir with torch .pth files")
    ap.add_argument("--dst", required=True, help="output model dir")
    ap.add_argument("--config", default=None,
                    help="optional XTTSConfig json (default: flagship)")
    args = ap.parse_args()

    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.utils.registry import load_model, save_npz

    cfg = (XTTSConfig.from_json(args.config) if args.config
           else XTTSConfig())
    os.makedirs(args.dst, exist_ok=True)

    alias = {"vqvae": ("vqvae", "dvae")}
    converted = []
    for name in ("gpt", "vqvae", "diffusion", "vocos", "clvp", "hifigan",
                 "classifier"):
        hits = []
        for stem in alias.get(name, (name,)):
            for ext in (".pth", ".pt", ".bin"):
                hits += sorted(glob.glob(os.path.join(args.src, stem + ext)))
        if not hits:
            print(f"  [skip] no {name} checkpoint in {args.src}")
            continue
        print(f"  converting {name} from {hits[0]} ...")
        _, variables = load_model(name, cfg, weights_path=hits[0])
        out = os.path.join(args.dst, name + ".npz")
        save_npz(out, variables)
        print(f"  wrote {out}")
        converted.append(name)

    if not converted:
        # no config either: a failed run must not leave a loadable-looking
        # model dir behind (from_pretrained would random-init silently)
        print("nothing converted", file=sys.stderr)
        sys.exit(1)
    cfg.to_json(os.path.join(args.dst, "xtts_config.json"))
    print(f"done: {', '.join(converted)} -> {args.dst} "
          f"(load with TextToSpeech.from_pretrained)")


if __name__ == "__main__":
    main()
