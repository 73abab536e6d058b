"""Japanese frontend + bulk file-op harness tests."""
import numpy as np
import pytest

from xtts_tpu.data.fileops import do_to_files
from xtts_tpu.text.japanese import kana_to_romaji, set_kanji_backend
from xtts_tpu.text.cleaner import clean_text


class TestJapanese:
    def test_basic_kana(self):
        assert kana_to_romaji("こんにちは") == ["kon", "ni", "chi", "ha"]

    def test_katakana_and_long_vowel(self):
        assert kana_to_romaji("ラーメン") == ["raa", "men"]

    def test_gemination(self):
        assert kana_to_romaji("がっこう") == ["ga", "kko", "u"]

    def test_digraphs(self):
        assert kana_to_romaji("きょう") == ["kyo", "u"]
        assert kana_to_romaji("ちゃ") == ["cha"]
        assert kana_to_romaji("じゅ") == ["ju"]
        assert kana_to_romaji("しゃ") == ["sha"]

    def test_punctuation_fold(self):
        toks = kana_to_romaji("はい。そう、です！")
        assert "." in toks and "," in toks and "!" in toks

    def test_latin_passthrough(self):
        assert kana_to_romaji("VIPです") == ["vip", "de", "su"]

    def test_kanji_dropped_without_backend(self):
        assert kana_to_romaji("私は") == ["ha"]  # kanji dropped, warning

    def test_kanji_backend_injection(self):
        set_kanji_backend(lambda s: s.replace("私", "わたし"))
        try:
            _, toks = clean_text("私は", "JA")
            assert toks == ["wa", "ta", "shi", "ha"]
        finally:
            set_kanji_backend(None)

    def test_cleaner_dispatch(self):
        _, toks = clean_text("こんにちは", "JP")  # JP alias
        assert toks == ["kon", "ni", "chi", "ha"]


class TestDoToFiles:
    def test_order_preserved(self):
        res, fails = do_to_files([1, 2, 3, 4], lambda x: x * 10,
                                 max_workers=2)
        assert res == [10, 20, 30, 40] and fails == []

    def test_collects_failures(self):
        def f(x):
            if x == 2:
                raise ValueError("boom")
            return x

        res, fails = do_to_files([1, 2, 3], f)
        assert res == [1, None, 3]
        assert len(fails) == 1 and fails[0][0] == 2

    def test_raise_mode(self):
        with pytest.raises(ZeroDivisionError):
            do_to_files([1], lambda x: 1 / 0, on_error="raise")


class TestCorpusDuration:
    def test_sums_and_formats(self, tmp_path):
        """duration_calc.sh semantics: per-file durations summed,
        HH:MM:SS.cc pretty string; unreadable files collected."""
        import numpy as np
        from xtts_tpu.data.audio import save_wav
        from xtts_tpu.data.fileops import corpus_duration

        p1 = str(tmp_path / "a.wav")
        p2 = str(tmp_path / "b.wav")
        save_wav(p1, np.zeros(24000, np.float32), 24000)   # 1.0 s
        save_wav(p2, np.zeros(36000, np.float32), 24000)   # 1.5 s
        bad = str(tmp_path / "c.wav")
        open(bad, "wb").write(b"not a wav")

        total, pretty, fails = corpus_duration([p1, p2, bad])
        assert abs(total - 2.5) < 1e-6
        assert pretty == "00:00:02.50"
        assert len(fails) == 1 and fails[0][0] == bad
