"""Golden parity: xtts_tpu.utils.alignment vs the reference
ttts/utils/wav2vec_alignment.py (max_alignment DP, per-character align,
bracket-span redact) on a synthetic CTC model — same logits, same fake
char tokenizer on both sides, byte-identical outputs expected.
"""
import types

import numpy as np
import pytest
import torch

from ref_stubs import install_reference_stubs

install_reference_stubs()

from ttts.utils import wav2vec_alignment as ref_wa  # noqa: E402

from xtts_tpu.utils import alignment as our_wa  # noqa: E402

# --- tiny char CTC vocab: 0 = blank, 1..27 = 'a'..'z' + ' ', 28 = UNK -----
CHARS = "abcdefghijklmnopqrstuvwxyz "
CHAR2ID = {c: i + 1 for i, c in enumerate(CHARS)}
UNK = 28
VOCAB = 29
FRAMES_PER_CHAR = 3
SAMPLES_PER_FRAME = 160


def ctc_decode(ids):
    out = []
    prev = None
    for i in ids:
        if i != prev and i != 0:
            out.append(CHARS[i - 1] if 1 <= i <= 27 else "?")
        prev = i
    return "".join(out)


def encode(s):
    return [CHAR2ID.get(c, UNK) for c in s]


class FakeTok:
    decode = staticmethod(ctc_decode)
    encode = staticmethod(encode)


class FakeModel:
    """Callable returning fixed logits, with .to/.cpu like an nn.Module."""

    def __init__(self, logits):
        self._logits = torch.from_numpy(logits)[None]

    def to(self, device):
        return self

    def cpu(self):
        return self

    def __call__(self, x):
        return types.SimpleNamespace(logits=self._logits)


def make_logits(spoken: str):
    """One-hot-ish logits emitting each char of `spoken` for a few frames
    with blanks between (so CTC-decode returns `spoken` exactly)."""
    rows = []
    for ch in spoken:
        tid = CHAR2ID[ch]
        rows += [tid] * FRAMES_PER_CHAR + [0]
    logits = np.full((len(rows), VOCAB), -10.0, np.float32)
    logits[np.arange(len(rows)), rows] = 10.0
    return logits


def make_pair(spoken: str):
    logits = make_logits(spoken)
    n_samples = len(logits) * SAMPLES_PER_FRAME
    audio = np.sin(np.linspace(0, 400 * np.pi, n_samples)).astype(np.float32)

    ref = ref_wa.Wav2VecAlignment.__new__(ref_wa.Wav2VecAlignment)
    ref.model = FakeModel(logits)
    ref.tokenizer = FakeTok()
    ref.device = "cpu"

    ours = our_wa.Wav2VecAlignment(
        model_fn=lambda wav: logits, encode=encode, decode=ctc_decode)
    return ref, ours, audio


@pytest.mark.parametrize("s1,s2", [
    ("the cat sat", "the cat sat"),
    ("the fat cat", "the cat"),
    ("abcdef", "ace"),
    ("hello world", "helo wrld"),
    ("abc", ""),
    ("", "xyz"),
    ("mississippi", "misisipi"),
    ("aabbcc", "abcabc"),
])
def test_max_alignment_parity(s1, s2):
    assert our_wa.max_alignment(s1, s2) == ref_wa.max_alignment(s1, s2)


def test_max_alignment_random_parity():
    rng = np.random.default_rng(3)
    for _ in range(40):
        n1, n2 = rng.integers(0, 14, 2)
        s1 = "".join(rng.choice(list("abcd "), n1))
        s2 = "".join(rng.choice(list("abcd "), n2))
        assert our_wa.max_alignment(s1, s2) == ref_wa.max_alignment(s1, s2), \
            (s1, s2)


@pytest.mark.parametrize("spoken,expected", [
    ("the cat sat on the mat", "the cat sat on the mat"),
    ("the fat cat sat", "the fat cat sat"),
    # model dropped some chars -> '~' interpolation path
    ("the ct sat", "the cat sat"),
    ("helo wrld", "hello world"),
])
def test_align_parity(spoken, expected):
    ref, ours, audio = make_pair(spoken)
    want = ref.align(torch.from_numpy(audio)[None], expected,
                     audio_sample_rate=16000)
    got = ours.align(audio, expected)
    assert got == list(want)
    assert len(got) == len(expected)


@pytest.mark.parametrize("spoken,marked", [
    ("i am sad please feed me", "[i am sad ]please feed me"),
    ("the fat cat sat", "the [fat ]cat sat"),
    ("one two three", "one [two ]three"),
    ("a b c", "[a ]b[ c]"),
])
def test_redact_parity(spoken, marked):
    ref, ours, audio = make_pair(spoken)
    want = ref.redact(torch.from_numpy(audio)[None], marked,
                      audio_sample_rate=16000)
    got = ours.redact(audio, marked)
    np.testing.assert_array_equal(got, np.asarray(want)[0])
    # redaction really removed audio
    assert len(got) < len(audio)


def test_redact_noop_without_brackets():
    _, ours, audio = make_pair("abc")
    out = ours.redact(audio, "abc")
    assert out is audio


def test_model_path_branch_with_real_wav2vec2(tmp_path):
    """Exercise the REAL checkpoint-loading branch (model_path=...) end to
    end: a random-init HF Wav2Vec2ForCTC + a real Wav2Vec2CTCTokenizer
    (locally-written vocab) saved with save_pretrained and loaded back —
    the exact path a user with a downloaded
    jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli checkpoint takes
    (wav2vec_alignment.py:48-56). Random weights emit garbage text, so
    alignment falls back to interpolated offsets; the contract is shape +
    monotonic non-negative offsets + redact removing audio."""
    import json as _json

    from transformers import (Wav2Vec2Config, Wav2Vec2CTCTokenizer,
                              Wav2Vec2ForCTC)

    from xtts_tpu.utils.alignment import Wav2VecAlignment

    vocab = {"<pad>": 0, "<unk>": 1, "|": 2}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz'"):
        vocab[ch] = i + 3
    vp = tmp_path / "vocab.json"
    vp.write_text(_json.dumps(vocab))
    tok = Wav2Vec2CTCTokenizer(str(vp), pad_token="<pad>",
                               unk_token="<unk>",
                               word_delimiter_token="|")
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(8, 8, 8, 8, 8, 8, 8), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2)
    model = Wav2Vec2ForCTC(cfg)
    model.save_pretrained(tmp_path)
    tok.save_pretrained(tmp_path)

    aligner = Wav2VecAlignment(model_path=str(tmp_path))
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)

    text = "hello world"
    offs = aligner.align(audio, text)
    assert len(offs) == len(text)
    assert all(0 <= o <= len(audio) for o in offs)
    assert all(b >= a for a, b in zip(offs, offs[1:]))   # non-decreasing

    red = aligner.redact(audio, "hello [world]")
    assert len(red) < len(audio)
