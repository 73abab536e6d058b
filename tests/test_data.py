"""Data layer tests: audio IO, VAD, filelists, datasets, bucketed collation,
prepare pipeline stages."""
import json
import os

import numpy as np
import pytest

from xtts_tpu.data.audio import (energy_vad_segments, get_prompt_slice,
                                 load_wav, make_pad_mask, resample, save_wav)
from xtts_tpu.data.datasets import (CLVPDataset, ClassifierDataset,
                                    DiffusionDataset, FilelistEntry,
                                    GptTTSDataset, MEL_BUCKETS, MelCache,
                                    TEXT_BUCKETS, VQVAEMelDataset,
                                    batch_iterator, collate_bucketed,
                                    next_bucket, pad_to, read_filelist,
                                    write_filelist)
from xtts_tpu.data.prepare import (build_bpe_corpus, cache_mels,
                                   cache_vq_codes, high_freq_energy_ratio,
                                   preprocess_text, transcribe, vad_split_file)


class TestAudio:
    def test_wav_roundtrip(self, tmp_path):
        wav = np.sin(np.arange(2400) / 10).astype(np.float32) * 0.5
        p = str(tmp_path / "a.wav")
        save_wav(p, wav, 24000)
        loaded, sr = load_wav(p)
        assert sr == 24000
        np.testing.assert_allclose(loaded, wav, atol=1e-3)

    def test_resample_halves_length(self):
        wav = np.random.default_rng(0).standard_normal(24000).astype(np.float32)
        out = resample(wav, 24000, 12000)
        assert abs(len(out) - 12000) <= 1

    def test_load_resamples(self, tmp_path):
        p = str(tmp_path / "b.wav")
        save_wav(p, np.zeros(24000, np.float32), 24000)
        w, sr = load_wav(p, target_sr=16000)
        assert sr == 16000 and abs(len(w) - 16000) <= 1

    def test_prompt_slice_bounds(self):
        wav = np.zeros(24000 * 30, np.float32)
        s = get_prompt_slice(wav, 24000, deterministic=True)
        assert len(s) == 24000 * 3  # deterministic -> min length

    def test_pad_mask(self):
        m = make_pad_mask(np.array([2, 4]), max_len=5)
        assert m.tolist() == [[False, False, True, True, True],
                              [False, False, False, False, True]]

    def test_silence_split_matches_pydub_oracle(self):
        """Differential check of the pydub split_on_silence re-implementation
        (ttts/prepare/vad_process.py:19: 600 ms / -40 dBFS / seek 100 /
        keep 50) against hand-computed boundaries.

        Layout (ms): tone[0,5000) sil[5000,6000) tone[6000,12000)
        sil[12000,14000) tone[14000,16500).
        detect_silence: silent 600 ms windows fully inside each gap ->
        merged ranges [5000,6000], [12000,14000]. Nonsilent: [0,5000],
        [6000,12000], [14000,16500]. keep_silence 50 margins ->
        [0,5050], [5950,12050], [13950,16500] (clamped). 4-20 s keep-window
        drops the 2.55 s tail clip."""
        from xtts_tpu.data.audio import (silence_split_segments,
                                         split_on_silence_ranges)
        sr = 16000

        def tone(ms):
            n = ms * sr // 1000
            return (np.sin(np.arange(n) * 0.3) * 0.3).astype(np.float32)

        def sil(ms):
            return np.zeros(ms * sr // 1000, np.float32)

        wav = np.concatenate([tone(5000), sil(1000), tone(6000), sil(2000),
                              tone(2500)])
        ranges = split_on_silence_ranges(wav, sr)
        assert ranges == [[0, 5050], [5950, 12050], [13950, 16500]]
        segs = silence_split_segments(wav, sr)
        assert segs == [(0, 5050 * sr // 1000),
                        (5950 * sr // 1000, 12050 * sr // 1000)]

    def test_silence_split_all_silent_and_all_voiced(self):
        from xtts_tpu.data.audio import split_on_silence_ranges
        sr = 8000
        assert split_on_silence_ranges(np.zeros(sr * 3, np.float32), sr) == []
        loud = (np.sin(np.arange(sr * 3) * 0.3) * 0.5).astype(np.float32)
        assert split_on_silence_ranges(loud, sr) == [[0, 3000]]

    def test_silence_split_short_gap_not_split(self):
        """A 400 ms pause is below min_silence_len=600 -> no split, matching
        pydub: no 600 ms window is fully silent."""
        from xtts_tpu.data.audio import split_on_silence_ranges
        sr = 16000
        t = (np.sin(np.arange(sr * 3) * 0.3) * 0.3).astype(np.float32)
        gap = np.zeros(sr * 400 // 1000, np.float32)
        wav = np.concatenate([t, gap, t])
        assert split_on_silence_ranges(wav, sr) == [[0, 6400]]

    def test_silence_split_threshold_edge(self):
        """Signal at -35 dBFS RMS stays voiced at the -40 dB threshold but
        splits at -30."""
        from xtts_tpu.data.audio import split_on_silence_ranges
        sr = 16000
        loud = (np.sin(np.arange(sr * 2) * 0.3) * 0.3).astype(np.float32)
        # sine amplitude a -> rms a/sqrt(2); -35 dBFS rms -> a = 0.0251
        quiet = (np.sin(np.arange(sr) * 0.3) * 0.0251).astype(np.float32)
        wav = np.concatenate([loud, quiet, loud])
        assert split_on_silence_ranges(wav, sr) == [[0, 5000]]
        assert len(split_on_silence_ranges(wav, sr, silence_db=-30.0)) == 2

    def test_vad_finds_speech_islands(self):
        sr = 16000
        sil = np.zeros(sr, np.float32)
        tone = (np.sin(np.arange(sr * 5) * 0.2) * 0.5).astype(np.float32)
        wav = np.concatenate([sil, tone, sil, sil, tone[:sr * 4], sil])
        segs = energy_vad_segments(wav, sr, keep_min_sec=2, keep_max_sec=10)
        assert len(segs) == 2
        s0 = segs[0]
        assert abs(s0[0] - sr) < sr * 0.2  # starts near 1 s


class TestFilelist:
    def test_roundtrip(self, tmp_path):
        entries = [FilelistEntry("k1", "/x/a.wav", "s1", "ZH", "你好", "ni2 hao3")]
        p = str(tmp_path / "fl.txt")
        write_filelist(p, entries)
        back = read_filelist(p)
        assert back == entries

    def test_malformed_skipped(self, tmp_path):
        p = str(tmp_path / "fl.txt")
        open(p, "w").write("bad line\nk|w|s|l|r|c\n")
        assert len(read_filelist(p)) == 1


class TestBucketing:
    def test_next_bucket(self):
        assert next_bucket(33, TEXT_BUCKETS) == 64
        assert next_bucket(5000, MEL_BUCKETS) == 2000  # clamps to last

    def test_pad_to(self):
        x = np.ones((2, 5))
        assert pad_to(x, 8).shape == (2, 8)
        assert pad_to(x, 3).shape == (2, 3)

    def test_collate_drops_none_and_buckets(self):
        samples = [
            {"text": np.ones(10, np.int32), "mel": np.ones((4, 50))},
            None,
            {"text": np.ones(20, np.int32), "mel": np.ones((4, 80))},
        ]
        out = collate_bucketed(
            samples, pad_axes={"text": 0, "mel": 1},
            buckets={"text": TEXT_BUCKETS, "mel": MEL_BUCKETS})
        assert out["text"].shape == (2, 32)          # bucket 32 >= 20
        assert out["mel"].shape == (2, 4, 100)       # bucket 100 >= 80
        assert out["text_length"].tolist() == [10, 20]

    def test_collate_all_none(self):
        assert collate_bucketed([None, None], {}, {}) is None


def _mk_wavs(tmp_path, n=3, seconds=1.0, sr=24000):
    paths = []
    for i in range(n):
        w = (np.sin(np.arange(int(sr * seconds)) * (0.02 + 0.01 * i)) * 0.4
             ).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        save_wav(p, w, sr)
        paths.append(p)
    return paths


def _fake_mel_fn(n_mels=10, hop=256):
    def fn(wav):
        f = len(wav) // hop
        return np.random.default_rng(0).standard_normal(
            (1, n_mels, f)).astype(np.float32)
    return fn


class TestDatasets:
    def test_vqvae_dataset_crop(self, tmp_path):
        paths = _mk_wavs(tmp_path)
        entries = [FilelistEntry(f"k{i}", p, "s", "ZH", "", "")
                   for i, p in enumerate(paths)]
        ds = VQVAEMelDataset(entries, MelCache(_fake_mel_fn()), crop_frames=60)
        s = ds[0]
        assert s["mel"].shape == (10, 60)

    def test_gpt_dataset(self, tmp_path):
        paths = _mk_wavs(tmp_path, seconds=2.0)
        entries = [FilelistEntry(f"k{i}", p, "s", "ZH", "你好", "ni2 hao3")
                   for i, p in enumerate(paths)]

        class Tok:
            def encode(self, s):
                return [1, 2, 3]

        ds = GptTTSDataset(entries, MelCache(_fake_mel_fn()), Tok())
        s = ds[0]
        assert s["text"].tolist() == [1, 2, 3]
        assert s["mel"].shape[0] == 10
        assert 0 < s["cond_mel"].shape[1] < s["mel"].shape[1]
        assert s["wav_length"] == s["mel"].shape[1] * 256

    def test_gpt_dataset_rejects_long(self, tmp_path):
        paths = _mk_wavs(tmp_path, n=1)
        entries = [FilelistEntry("k", paths[0], "s", "ZH", "", "")]

        class Tok:
            def encode(self, s):
                return list(range(500))

        ds = GptTTSDataset(entries, MelCache(_fake_mel_fn()), Tok())
        assert ds[0] is None

    def test_diffusion_dataset(self, tmp_path):
        paths = _mk_wavs(tmp_path, seconds=3.0)
        entries = [FilelistEntry(f"k{i}", p, "s", "ZH", "x", "x")
                   for i, p in enumerate(paths)]

        class Tok:
            def encode(self, s):
                return [1]

        ds = DiffusionDataset(entries, MelCache(_fake_mel_fn()), Tok())
        s = ds[0]
        assert s["mel"].shape[1] <= 400
        assert s["refer_mel"].shape[1] <= 300

    def test_classifier_dataset(self, tmp_path):
        mel = np.zeros((10, 100), np.float32)
        p = str(tmp_path / "m.mel.npy")
        np.save(p, mel)
        ds = ClassifierDataset([p], [p], MelCache(), crop_frames=50)
        assert ds[0]["label"] == 0 and ds[1]["label"] == 1
        assert ds[0]["mel"].shape == (10, 50)

    def test_batch_iterator(self, tmp_path):
        paths = _mk_wavs(tmp_path, n=4)
        entries = [FilelistEntry(f"k{i}", p, "s", "ZH", "", "")
                   for i, p in enumerate(paths)]
        ds = VQVAEMelDataset(entries, MelCache(_fake_mel_fn()), crop_frames=40)
        it = batch_iterator(
            ds, 2, lambda ss: collate_bucketed(ss, {}, {}), epochs=1)
        batches = list(it)
        assert len(batches) == 2
        assert batches[0]["mel"].shape == (2, 10, 40)


class TestPrepare:
    def test_vad_split_file(self, tmp_path):
        sr = 24000
        sil = np.zeros(sr, np.float32)
        tone = (np.sin(np.arange(sr * 5) * 0.2) * 0.5).astype(np.float32)
        p = str(tmp_path / "long.wav")
        save_wav(p, np.concatenate([sil, tone, sil]), sr)
        clips = vad_split_file(p, str(tmp_path / "clips"), sr,
                               keep_min_sec=2, keep_max_sec=10)
        assert len(clips) == 1 and os.path.exists(clips[0])

    def test_transcribe_without_backend_raises(self):
        with pytest.raises(RuntimeError, match="ASR backend"):
            transcribe("/x.wav")

    def test_transcribe_with_backend(self):
        assert transcribe("/x.wav", lambda p: "你好") == "你好"

    def test_preprocess_text(self, tmp_path):
        recs = [{"path": "/a/x1.wav", "text": "你好世界"},
                {"path": "/a/x2.wav", "text": ""}]
        out = str(tmp_path / "fl.txt")
        entries = preprocess_text(recs, out, "ZH")
        assert len(entries) == 1
        assert "ni2" in entries[0].cleaned_text
        assert read_filelist(out)[0].key == "x1"

    def test_mel_and_vq_cache(self, tmp_path):
        paths = _mk_wavs(tmp_path, n=2)
        n = cache_mels(paths, _fake_mel_fn())
        assert n == 2 and os.path.exists(paths[0] + ".mel.npy")
        assert cache_mels(paths, _fake_mel_fn()) == 0  # cached; skip
        n = cache_vq_codes(paths, lambda mel: np.zeros(
            (1, mel.shape[-1] // 4), np.int64))
        assert n == 2
        codes = np.load(paths[0] + ".melvq.npy")
        assert codes.dtype == np.int32

    def test_clvp_dataset_reads_vq(self, tmp_path):
        paths = _mk_wavs(tmp_path, n=1)
        np.save(paths[0] + ".melvq.npy", np.arange(20, dtype=np.int32))

        class Tok:
            def encode(self, s):
                return [1, 2]

        entries = [FilelistEntry("k", paths[0], "s", "ZH", "x", "x")]
        ds = CLVPDataset(entries, Tok())
        s = ds[0]
        assert s["codes"].shape == (20,) and s["text"].tolist() == [1, 2]

    def test_bpe_corpus_and_hifreq(self, tmp_path):
        entries = [FilelistEntry("k", "/x.wav", "s", "ZH", "你好", "ni2 hao3")]
        out = str(tmp_path / "corpus.txt")
        assert build_bpe_corpus(entries, out) == 1
        wav = np.random.default_rng(0).standard_normal(24000).astype(np.float32)
        r_full = high_freq_energy_ratio(wav, 24000)
        # low-passed signal must score lower
        from scipy.signal import butter, sosfilt
        sos = butter(8, 4000, fs=24000, output="sos")
        r_lp = high_freq_energy_ratio(
            sosfilt(sos, wav).astype(np.float32), 24000)
        assert r_lp < r_full


class TestASR:
    """data/asr.py — transcript acceptance (asr_process.py:31-38) and the
    Whisper adapter (random-init model + stub tokenizer; no files/network)."""

    def test_accept_transcript_rule(self):
        from xtts_tpu.data.asr import accept_transcript
        assert accept_transcript("这是一个足够长的句子")
        assert not accept_transcript("短")                   # < 5 chars
        assert not accept_transcript("这句话含有abc字母")     # Latin letters
        assert not accept_transcript("okay")                 # both

    def test_vad_asr_jsonl_applies_filter(self, tmp_path):
        from xtts_tpu.data.prepare import vad_asr_to_jsonl
        texts = {"a.wav": "这是一个足够长的句子", "b.wav": "短",
                 "c.wav": "mixed语言output"}
        out = tmp_path / "o.jsonl"
        vad_asr_to_jsonl(list(texts), str(out), asr_fn=lambda p: texts[p])
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert [r["path"] for r in rows] == ["a.wav"]
        # opt-out keeps everything
        vad_asr_to_jsonl(list(texts), str(out), asr_fn=lambda p: texts[p],
                         accept=lambda t: True)
        assert len(out.read_text().splitlines()) == 3

    def test_whisper_adapter_random_model(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import (WhisperConfig, WhisperFeatureExtractor,
                                  WhisperForConditionalGeneration)
        from xtts_tpu.data.asr import WhisperASR
        from xtts_tpu.data.audio import save_wav

        cfg = WhisperConfig(
            vocab_size=64, num_mel_bins=80, d_model=32,
            encoder_layers=1, decoder_layers=1, encoder_attention_heads=2,
            decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_source_positions=1500, max_target_positions=64,
            decoder_start_token_id=1, pad_token_id=0, bos_token_id=1,
            eos_token_id=2, suppress_tokens=[], begin_suppress_tokens=[])
        model = WhisperForConditionalGeneration(cfg)

        class StubTok:
            def get_decoder_prompt_ids(self, language, task):
                raise KeyError(language)        # adapter must tolerate

            def batch_decode(self, ids, skip_special_tokens=True):
                return ["  token" + "".join(str(int(i)) for i in ids[0][:3])]

        class StubProc:
            feature_extractor = WhisperFeatureExtractor()
            tokenizer = StubTok()

        asr = WhisperASR(model=model, processor=StubProc())
        wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(24000) / 24000)
               ).astype(np.float32)
        p = tmp_path / "x.wav"
        save_wav(str(p), wav, 24000)            # adapter resamples to 16 k
        text = asr(str(p))
        assert isinstance(text, str) and text == text.strip() and text


class TestPrefetchIterator:
    """Background-thread prefetch (the reference's DataLoader num_workers
    analogue, ttts/gpt/train_ms.py:104-110)."""

    def test_same_stream(self):
        from xtts_tpu.data.datasets import prefetch_iterator
        src = [{"x": np.full((2,), i)} for i in range(7)]
        got = list(prefetch_iterator(iter(src), depth=2))
        assert len(got) == 7
        for i, b in enumerate(got):
            np.testing.assert_array_equal(b["x"], src[i]["x"])

    def test_depth_zero_noop(self):
        from xtts_tpu.data.datasets import prefetch_iterator
        assert list(prefetch_iterator(iter([1, 2, 3]), depth=0)) == [1, 2, 3]

    def test_exception_propagates(self):
        from xtts_tpu.data.datasets import prefetch_iterator

        def bad():
            yield 1
            raise RuntimeError("loader died")

        it = prefetch_iterator(bad(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="loader died"):
            list(it)

    def test_batch_iterator_prefetch_equals_sync(self):
        from xtts_tpu.data.datasets import batch_iterator

        class Toy:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return {"x": np.full((3,), i, np.float32)}

        coll = lambda ss: {"x": np.stack([s["x"] for s in ss])}
        sync = list(batch_iterator(Toy(), 3, coll, seed=5, epochs=2))
        pre = list(batch_iterator(Toy(), 3, coll, seed=5, epochs=2,
                                  prefetch=3))
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            np.testing.assert_array_equal(a["x"], b["x"])


class TestEvalMetrics:
    def test_mel_l1_and_mcd_zero_for_identical(self):
        from xtts_tpu.dsp.mel import MelFrontend
        from xtts_tpu.core.config import MelConfig
        from xtts_tpu.infer.eval_tools import mcd, mel_l1
        mel_fn = MelFrontend(MelConfig(n_mels=16))
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        assert mel_l1(mel_fn, wav, wav) == 0.0
        assert mcd(mel_fn, wav, wav) == 0.0

    def test_metrics_order_distortion(self):
        """More distortion -> larger metric; length mismatch tolerated."""
        from xtts_tpu.dsp.mel import MelFrontend
        from xtts_tpu.core.config import MelConfig
        from xtts_tpu.infer.eval_tools import mcd, mel_l1
        mel_fn = MelFrontend(MelConfig(n_mels=16))
        rng = np.random.default_rng(1)
        wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        small = wav + 0.01 * rng.standard_normal(8000).astype(np.float32)
        big = wav + 0.1 * rng.standard_normal(8000).astype(np.float32)
        assert 0 < mel_l1(mel_fn, wav, small[:7500]) < mel_l1(mel_fn, wav, big)
        assert 0 < mcd(mel_fn, wav, small) < mcd(mel_fn, wav, big)


    def test_abandoned_generator_releases_fill_thread(self):
        """Training loops exit via `break`; closing the generator must
        unblock and release the fill thread (no leak per run)."""
        import threading
        import time
        from xtts_tpu.data.datasets import prefetch_iterator

        def src():
            for i in range(1000):
                yield {"x": np.zeros(4)}

        it = prefetch_iterator(src(), depth=2)
        next(it)
        it.close()                      # GeneratorExit -> stop + drain
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if not any(t.name == "prefetch-fill" and t.is_alive()
                       for t in threading.enumerate()):
                break
            time.sleep(0.05)
        assert not any(t.name == "prefetch-fill" and t.is_alive()
                       for t in threading.enumerate())


class TestEvaluateCLI:
    """examples/evaluate.py — the reference's offline eval tool
    (ttts/vqvae/inference.py:31-115) as a runnable CLI."""

    def test_end_to_end(self, tmp_path, capsys):
        import importlib.util
        import json as _json

        import jax

        from xtts_tpu.core.config import (DVAEConfig, MelConfig, VocosConfig,
                                          XTTSConfig)
        from xtts_tpu.data.audio import save_wav

        cfg = XTTSConfig(
            mel=MelConfig(n_mels=16),
            vqvae=DVAEConfig(channels=16, num_tokens=32, hidden_dim=8,
                             num_resnet_blocks=1, codebook_dim=8,
                             num_layers=2),
            vocos=VocosConfig(input_channels=16, dim=16, intermediate_dim=32,
                              num_layers=1, n_fft=64, hop_length=16))
        cfg_p = str(tmp_path / "cfg.json")
        cfg.to_json(cfg_p)
        rng = np.random.default_rng(0)
        lines = []
        for i in range(2):
            p = str(tmp_path / f"c{i}.wav")
            save_wav(p, (rng.standard_normal(8000) * 0.1).astype(np.float32),
                     24000)
            # both filelist formats: bare path and 6-field
            lines.append(p if i == 0 else f"k|{p}|s|ZH|x|y")
        fl = str(tmp_path / "fl.txt")
        with open(fl, "w") as f:
            f.write("\n".join(lines) + "\n")

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "evaluate_cli", os.path.join(root, "examples", "evaluate.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out_jsonl = str(tmp_path / "per.jsonl")
        wav_dir = str(tmp_path / "renders")
        mod.main(["--filelist", fl, "--config", cfg_p,
                  "--out-jsonl", out_jsonl, "--wav-dir", wav_dir])
        summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["n"] == 2 and np.isfinite(summary["mel_l1_mean"])
        recs = [_json.loads(l) for l in open(out_jsonl)]
        assert len(recs) == 2 and all("mel_l1" in r for r in recs)
