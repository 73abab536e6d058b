"""Offline evaluation tools.

Reference: ttts/vqvae/inference.py:31-115 (recon loss, VQ code dump, mel
images, optional wav via vocos over a filelist) and ttts/api_zh.py:25-47
(single-clip VQVAE round-trip demo). Used to sanity-check a trained DVAE and
to produce the mel-L1 parity numbers BASELINE.md tracks.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def dvae_roundtrip(dvae, variables, mel: np.ndarray):
    """One mel (bins, T) -> dict(codes, recon, mel_l1, code_usage)."""
    mel_j = jnp.asarray(mel, jnp.float32)[None]
    codes = dvae.apply(variables, mel_j, method=dvae.get_codebook_indices)
    recon, _ = dvae.apply(variables, codes, method=dvae.decode)
    t = min(mel.shape[-1] // 4 * 4, recon.shape[-1])
    l1 = float(jnp.abs(recon[0, :, :t] - mel_j[0, :, :t]).mean())
    c = np.asarray(codes[0])
    return {"codes": c, "recon": np.asarray(recon[0]), "mel_l1": l1,
            "unique_codes": int(len(np.unique(c)))}


def evaluate_dvae(dvae, variables, mel_paths: Sequence[str],
                  out_jsonl: Optional[str] = None,
                  vocos=None, vocos_vars=None, wav_dir: Optional[str] = None,
                  sample_rate: int = 24000, mel_fn=None):
    """Filelist-scale DVAE eval (ttts/vqvae/inference.py semantics):
    per-clip mel-L1 + codebook usage; optional wav renders via Vocos.

    mel_fn: optional frontend for raw-wav paths; without it only
    pre-cached `.mel.npy` entries are scored.
    Returns summary dict {mel_l1_mean, codebook_usage, n}.
    """
    from xtts_tpu.data.datasets import MelCache
    from xtts_tpu.data.audio import save_wav
    cache = MelCache(mel_fn, sample_rate=sample_rate)
    results = []
    seen_codes: set = set()
    writer = open(out_jsonl, "w") if out_jsonl else None
    for p in mel_paths:
        mel = cache(p)
        if mel is None:
            log.warning("no mel for %s", p)
            continue
        r = dvae_roundtrip(dvae, variables, mel)
        seen_codes.update(np.unique(r["codes"]).tolist())
        rec = {"path": p, "mel_l1": r["mel_l1"],
               "unique_codes": r["unique_codes"]}
        results.append(rec)
        if writer:
            writer.write(json.dumps(rec) + "\n")
        if vocos is not None and wav_dir is not None:
            os.makedirs(wav_dir, exist_ok=True)
            wav = vocos.apply(vocos_vars, jnp.asarray(r["recon"])[None])
            name = os.path.splitext(os.path.basename(p))[0] + "_recon.wav"
            save_wav(os.path.join(wav_dir, name), np.asarray(wav[0]),
                     sample_rate)
    if writer:
        writer.close()
    if not results:
        return {"mel_l1_mean": float("nan"), "codebook_usage": 0, "n": 0}
    return {
        "mel_l1_mean": float(np.mean([r["mel_l1"] for r in results])),
        "codebook_usage": len(seen_codes),
        "n": len(results),
    }


# ---------------------------------------------------------------------------
# objective waveform/mel metrics (for renderer comparisons and the int4
# quality gate on real weights; the reference has no metric tooling — its
# evals are perceptual TB spot-checks, ttts/diffusion/train.py:213-247)
# ---------------------------------------------------------------------------


def _bucketed_mel_pair(mel_fn, wav_a: np.ndarray, wav_b: np.ndarray):
    """Common-length mels of two renders: pad both to a 8192-sample bucket
    (device-facing lengths must snap to ladders — CLAUDE.md; one jitted
    STFT compile per bucket, not per clip pair), then trim to the frames
    fully covered by the true shared length."""
    n = min(len(np.ravel(wav_a)), len(np.ravel(wav_b)))
    nb = max(-(-n // 8192) * 8192, 8192)
    pad = lambda w: np.pad(np.asarray(w, np.float32).reshape(-1)[:n],
                           (0, nb - n))
    a, b = mel_fn(pad(wav_a)), mel_fn(pad(wav_b))
    frames = max(n // mel_fn.cfg.hop_length, 1)
    return a[..., :frames], b[..., :frames]


def mel_l1(mel_fn, wav_a: np.ndarray, wav_b: np.ndarray) -> float:
    """Mean |mel_a - mel_b| between two waveforms (same sample rate),
    over their shared length — the BASELINE.md mel-parity metric applied
    between two renders (e.g. fp vs int4, diffusion vs hifigan)."""
    a, b = _bucketed_mel_pair(mel_fn, wav_a, wav_b)
    return float(jnp.abs(a - b).mean())


def mcd(mel_fn, wav_a: np.ndarray, wav_b: np.ndarray,
        n_coeff: int = 13) -> float:
    """Mel-cepstral-distortion-style distance (dB) between two renders:
    DCT-II of the log-mel (coefficients 1..n_coeff, c0/energy excluded),
    frame-mean of the 10/ln10 * sqrt(2 * sum dc^2) norm. Computed from the
    pipeline's own log-mel frontend rather than WORLD/SPTK (zero-egress
    image) — comparable across renders of the same text, not against
    published MCD tables."""
    a, b = _bucketed_mel_pair(mel_fn, wav_a, wav_b)
    a, b = np.asarray(a)[0].T, np.asarray(b)[0].T   # (T, bins) log-mels
    bins = a.shape[1]
    k = np.arange(1, n_coeff + 1)[None, :]      # skip c0
    basis = np.cos(np.pi * k * (2 * np.arange(bins)[:, None] + 1)
                   / (2 * bins))                # (bins, n_coeff) DCT-II
    ca, cb = a @ basis, b @ basis
    d = np.sqrt(2.0 * np.sum((ca - cb) ** 2, axis=1))
    return float((10.0 / np.log(10.0)) * d.mean())
