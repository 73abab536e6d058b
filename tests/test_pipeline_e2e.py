"""Full training-recipe integration test — the reference's 5-stage pipeline
(ttts/train_step.py:1-6: BPE -> VQVAE -> GPT (-> CLVP) -> diffusion) chained
end-to-end on a synthetic micro-corpus through the REAL user surfaces:
data/prepare stages -> train CLI (exported <family>.npz weights feed the
next stage exactly as documented) -> TextToSpeech.from_pretrained -> tts().

Everything is tiny (test_api_e2e.TINY) and CPU; the value is the seams:
npz export/load across stages, trained-tokenizer text frontend, and that a
user can walk the reference README's workflow (README.md:33-53) without
touching internals.
"""
import json
import os
import shutil

import jax
import numpy as np
import pytest

from test_api_e2e import MEL_BINS, TINY


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Stage 0: raw wavs + transcripts -> filelist (preprocess_text) +
    trained BPE tokenizer (build_bpe_corpus/train_bpe_from_corpus)."""
    from xtts_tpu.data.audio import save_wav
    from xtts_tpu.data.prepare import (build_bpe_corpus, preprocess_text,
                                       train_bpe_from_corpus)

    root = tmp_path_factory.mktemp("pipeline")
    rng = np.random.default_rng(0)
    texts = ["你好", "早上好", "谢谢你"]
    records = []
    for i, t in enumerate(texts):
        # 20000 samples = 79 mel frames = 20 codes, inside TINY's
        # max_mel_tokens=24 (4*24=96-frame cap the CLI derives from cfg)
        wav = (rng.standard_normal(20000) * 0.1).astype(np.float32)
        p = str(root / f"clip{i}.wav")
        save_wav(p, wav, 24000)
        records.append({"path": p, "text": t})

    fl = str(root / "filelist.txt")
    entries = preprocess_text(records, fl)
    assert len(entries) == 3

    bpe_corpus = str(root / "bpe.txt")
    assert build_bpe_corpus(entries, bpe_corpus) == 3
    tok_path = str(root / "tokenizer.json")
    train_bpe_from_corpus(bpe_corpus, tok_path, vocab_size=120)

    from xtts_tpu.core.config import CLVPConfig
    cfg = TINY.replace(
        train=TINY.train.replace(
            batch_size=2, val_freq=100, save_freq=100, accum_grad=1,
            warmup_steps=1, train_steps=2),
        clvp=CLVPConfig(dim_text=32, dim_speech=32, dim_latent=16,
                        text_enc_depth=1, speech_enc_depth=1, text_heads=2,
                        speech_heads=2, num_speech_tokens=32))
    cfg_path = str(root / "cfg.json")
    cfg.to_json(cfg_path)
    return {"filelist": fl, "cfg": cfg_path, "cfg_obj": cfg,
            "root": str(root), "tokenizer": tok_path,
            "wavs": [r["path"] for r in records]}


def _assert_finite_npz(path):
    """Trained weights must be finite — NaN params were exactly the failure
    mode of the capacity-mismatch bugs this test guards (OOB position
    gathers fill NaN under jit)."""
    z = np.load(path)
    bad = [k for k in z.files if not np.isfinite(z[k]).all()]
    assert not bad, f"non-finite arrays in {path}: {bad[:5]}"


def test_train_recipe_to_inference(corpus, tmp_path):
    from xtts_tpu.train.cli import main

    root = str(tmp_path)
    base = ["-c", corpus["cfg"], "--filelist", corpus["filelist"],
            "--tokenizer", corpus["tokenizer"], "--steps", "2",
            "--prefetch", "0"]

    # stage 2 (train_step.py step 2): VQVAE
    main(["vqvae", "-m", f"{root}/vq"] + base)
    vq_npz = f"{root}/vq/vqvae.npz"
    assert os.path.exists(vq_npz)
    _assert_finite_npz(vq_npz)

    # stage 2.5: VQ-code cache with the TRAINED dvae (save_mel_vq_to_disk)
    from xtts_tpu.data.prepare import cache_mels, cache_vq_codes
    from xtts_tpu.dsp.mel import MelFrontend
    from xtts_tpu.utils.registry import load_model
    cfg = corpus["cfg_obj"]
    mel_fn = MelFrontend(cfg.mel)
    assert cache_mels(corpus["wavs"], lambda w: mel_fn(w[None])) == 3
    dvae, dv = load_model("vqvae", cfg, weights_path=vq_npz)
    codes_fn = jax.jit(
        lambda m: dvae.apply(dv, m, method=dvae.get_codebook_indices))
    assert cache_vq_codes(corpus["wavs"], codes_fn) == 3

    # stage 3: GPT on (text -> codes), dvae frozen from stage 2
    main(["gpt", "-m", f"{root}/gpt", "--dvae-weights", vq_npz] + base)
    gpt_npz = f"{root}/gpt/gpt.npz"
    assert os.path.exists(gpt_npz)
    _assert_finite_npz(gpt_npz)

    # stage 3.5: CLVP over the cached .melvq.npy codes
    main(["clvp", "-m", f"{root}/clvp"] + base)
    clvp_npz = f"{root}/clvp/clvp.npz"
    assert os.path.exists(clvp_npz)
    _assert_finite_npz(clvp_npz)

    # stage 4: diffusion decoder on frozen GPT latents
    main(["diffusion", "-m", f"{root}/diff", "--dvae-weights", vq_npz,
          "--gpt-weights", gpt_npz, "-c", corpus["cfg"],
          "--filelist", corpus["filelist"], "--tokenizer",
          corpus["tokenizer"], "--steps", "1", "--prefetch", "0"])
    diff_npz = f"{root}/diff/diffusion.npz"
    assert os.path.exists(diff_npz)
    _assert_finite_npz(diff_npz)

    # stage 5: assemble a model dir and run zero-shot inference on it
    model_dir = f"{root}/model"
    os.makedirs(model_dir)
    shutil.copy(vq_npz, f"{model_dir}/vqvae.npz")
    shutil.copy(gpt_npz, f"{model_dir}/gpt.npz")
    shutil.copy(clvp_npz, f"{model_dir}/clvp.npz")
    shutil.copy(diff_npz, f"{model_dir}/diffusion.npz")
    shutil.copy(corpus["tokenizer"], f"{model_dir}/tokenizer.json")
    cfg.to_json(f"{model_dir}/xtts_config.json")

    from xtts_tpu.infer.api import TextToSpeech, TTSSettings
    tts = TextToSpeech.from_pretrained(model_dir, with_clvp=True)
    assert tts.tokenizer is not None     # picked up tokenizer.json
    cond = (np.random.default_rng(1).standard_normal(24000) * 0.1
            ).astype(np.float32)
    s = TTSSettings(max_mel_tokens=8, diffusion_steps=2, temperature=1e-4)
    wav = tts.tts("你好。", cond, key=jax.random.PRNGKey(0), settings=s)
    assert wav.size > 0 and np.isfinite(wav).all()
