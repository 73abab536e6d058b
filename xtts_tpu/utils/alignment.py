"""CTC forced alignment for redaction (tortoise path).

Reference: ttts/utils/wav2vec_alignment.py:45-146 Wav2VecAlignment — aligns
generated audio against its text with a wav2vec2-CTC model so bracketed
spans ("[I am really sad,] Please feed me.") can be cut from the waveform
(api.py:180-181,536-540).

This image has no model weights baked in (zero egress), so construction
requires a local wav2vec2 checkpoint path; the alignment math itself
(greedy CTC viterbi-free span mapping) is self-contained and unit-testable
via `align_from_logits`.
"""
from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

import numpy as np


def find_redactions(text: str) -> Tuple[str, List[Tuple[int, int]]]:
    """Strip [bracketed] spans; return (clean_text, spans as char ranges in
    the CLEAN text marking where redacted material bordered)."""
    spans = []
    out = ""
    for m in re.finditer(r"\[([^\]]*)\]|([^\[\]]+)", text):
        if m.group(1) is not None:
            spans.append((len(out), len(out)))
        else:
            out += m.group(2)
    return out, spans


def align_from_logits(logits: np.ndarray, token_ids: List[int],
                      blank_id: int = 0) -> List[int]:
    """Monotonic greedy CTC alignment: for each target token, the frame index
    where it is first emitted (argmax path restricted to the target order).

    logits: (T_frames, vocab). Mirrors the frame-mapping loop of
    wav2vec_alignment.py:45-146 without the torch dependency.
    """
    path = logits.argmax(-1)
    frames: List[int] = []
    ti = 0
    for f, p in enumerate(path):
        if ti >= len(token_ids):
            break
        if p == token_ids[ti]:
            frames.append(f)
            ti += 1
    # unmatched tail tokens: clamp to last frame
    while len(frames) < len(token_ids):
        frames.append(len(path) - 1)
    return frames


class Wav2VecAlignment:
    """Wraps a local wav2vec2-CTC checkpoint for audio/text alignment.

    model_fn: wav (T,) float32 16 kHz -> (frames, vocab) CTC logits. Built
    from a local transformers checkpoint when `model_path` is given.
    """

    def __init__(self, model_path: Optional[str] = None,
                 model_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 sample_rate: int = 16000):
        self.sample_rate = sample_rate
        if model_fn is not None:
            self._fn = model_fn
            self.tokenizer = None
        elif model_path is not None:
            import torch
            from transformers import (Wav2Vec2CTCTokenizer,
                                      Wav2Vec2ForCTC)
            model = Wav2Vec2ForCTC.from_pretrained(model_path)
            model.eval()
            self.tokenizer = Wav2Vec2CTCTokenizer.from_pretrained(model_path)

            def fn(wav: np.ndarray) -> np.ndarray:
                with torch.no_grad():
                    out = model(torch.from_numpy(wav[None]).float()).logits
                return out[0].numpy()

            self._fn = fn
        else:
            raise RuntimeError(
                "Wav2VecAlignment needs a local wav2vec2 checkpoint "
                "(model_path=...) or an injected model_fn — no weights are "
                "baked into this image (reference downloads "
                "jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli, "
                "ttts/utils/wav2vec_alignment.py:48-56)")

    def align(self, wav: np.ndarray, token_ids: List[int],
              blank_id: int = 0) -> List[int]:
        """Token ids -> sample offsets in `wav`."""
        logits = self._fn(np.asarray(wav, np.float32))
        frames = align_from_logits(logits, token_ids, blank_id)
        samples_per_frame = len(wav) / max(len(logits), 1)
        return [int(f * samples_per_frame) for f in frames]

    def redact(self, wav: np.ndarray, text: str,
               encode: Callable[[str], List[int]]) -> np.ndarray:
        """Cut audio spans corresponding to [bracketed] text (api semantics).

        encode: text -> CTC token ids for the alignment model.
        """
        if "[" not in text:
            return wav
        clean, spans = find_redactions(text)
        ids = encode(clean)
        if not ids:
            return wav
        offsets = self.align(wav, ids)
        # redaction points are boundaries; nothing to cut if no chars matched
        keep = np.ones(len(wav), bool)
        for pos, _ in spans:
            # cut a short window around the boundary where redacted speech
            # would have been spliced
            tok_idx = min(int(pos / max(len(clean), 1) * len(ids)),
                          len(offsets) - 1)
            s = offsets[tok_idx]
            e = offsets[min(tok_idx + 1, len(offsets) - 1)]
            if e > s:
                keep[s:e] = False
        return wav[keep]
