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
