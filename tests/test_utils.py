"""Utility tests: model registry, npz save/load, random latent converter,
CTC alignment math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import (ClassifierConfig, CLVPConfig, DVAEConfig,
                                  XTTSConfig)
from xtts_tpu.utils.alignment import (Wav2VecAlignment, align_from_logits,
                                      find_redactions)
from xtts_tpu.utils.latents import (RandomLatentConverter,
                                    random_conditioning_latent)
from xtts_tpu.utils.registry import (MODELS, load_model, save_npz,
                                     unflatten_npz)

TINY = XTTSConfig(
    vqvae=DVAEConfig(channels=8, num_tokens=16, hidden_dim=8,
                     num_resnet_blocks=1, codebook_dim=8),
    clvp=CLVPConfig(dim_text=16, dim_speech=16, dim_latent=8,
                    text_enc_depth=1, speech_enc_depth=1, text_heads=2,
                    speech_heads=2),
    classifier=ClassifierConfig(base_channels=4, depth=2, resnet_blocks=1,
                                attn_blocks=1, num_attn_heads=2),
)


class TestRegistry:
    def test_registry_covers_inventory(self):
        # every model family from SURVEY.md §2 is loadable by name
        assert {"gpt", "vqvae", "diffusion", "vocos", "clvp", "classifier",
                "hifigan"} <= set(MODELS)

    def test_unknown_name(self):
        with pytest.raises(KeyError, match="unknown model"):
            load_model("nope")

    def test_load_random_and_npz_roundtrip(self, tmp_path):
        model, variables = load_model("vqvae", TINY)
        p = str(tmp_path / "w.npz")
        save_npz(p, variables)   # full variables: params + codebook
        model2, v2 = load_model("vqvae", TINY, weights_path=p)
        assert set(v2) == set(variables)   # collections preserved
        a = jax.tree_util.tree_leaves(variables)
        b = jax.tree_util.tree_leaves(v2)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # functional equality through a collection-using method
        mel = jnp.zeros((1, 8, 64))
        c1 = model.apply(variables, mel, method=model.get_codebook_indices)
        c2 = model2.apply(v2, mel, method=model2.get_codebook_indices)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_clvp_loads(self):
        model, variables = load_model("clvp", TINY)
        logits = model.apply(variables, jnp.zeros((2, 4), jnp.int32),
                             jnp.zeros((2, 4), jnp.int32))
        assert logits.shape == (2, 2)


class TestRandomLatent:
    def test_shapes_and_determinism(self):
        m = RandomLatentConverter(channels=16)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
        a = random_conditioning_latent(m, v, jax.random.PRNGKey(1), batch=3)
        b = random_conditioning_latent(m, v, jax.random.PRNGKey(1), batch=3)
        assert a.shape == (3, 16)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAlignment:
    def test_find_redactions(self):
        clean, spans = find_redactions("[I am sad,] Please feed me.")
        assert clean == " Please feed me."
        assert spans == [(0, 0)]

    def test_align_from_logits_monotonic(self):
        # 10 frames, vocab 5; tokens 2 then 3 appear at frames 2 and 6
        logits = np.full((10, 5), -5.0)
        logits[:, 0] = 0.0          # blank elsewhere
        logits[2, 2] = 5.0
        logits[6, 3] = 5.0
        assert align_from_logits(logits, [2, 3]) == [2, 6]

    def test_align_clamps_missing(self):
        logits = np.zeros((4, 3))
        logits[:, 0] = 1.0
        assert align_from_logits(logits, [1, 2]) == [3, 3]

    def test_requires_backend(self):
        with pytest.raises(RuntimeError, match="wav2vec2"):
            Wav2VecAlignment()

    def test_redact_with_injected_model(self):
        # fake char CTC over 'a'..'c'+' ' (ids 1..4, 0=blank): each char of
        # the spoken text "cut abc" emitted for 2 frames + a blank
        chars = "cut abx"   # 'x' stands in for chars outside vocab
        vocab = {c: i + 1 for i, c in enumerate("cut abx")}

        def encode(s):
            return [vocab.get(ch, 9) for ch in s]

        def decode(ids):
            inv = {v: k for k, v in vocab.items()}
            out, prev = [], None
            for i in ids:
                if i != prev and i != 0:
                    out.append(inv.get(i, "?"))
                prev = i
            return "".join(out)

        spoken = "cut ab"
        rows = []
        for ch in spoken:
            rows += [vocab[ch]] * 2 + [0]
        logits = np.full((len(rows), 10), -1.0)
        logits[np.arange(len(rows)), rows] = 5.0

        al = Wav2VecAlignment(model_fn=lambda wav: logits, encode=encode,
                              decode=decode)
        wav = np.arange(len(rows) * 100, dtype=np.float32)
        out = al.redact(wav, "[cut ]ab")
        assert len(out) < len(wav)          # bracketed span was excised
        # the kept audio is the aligned span of "ab", a contiguous suffix cut
        assert np.all(np.diff(out) == 1)
        out2 = al.redact(wav, "cut ab")
        assert len(out2) == len(wav)        # no brackets -> untouched


class TestEvalTools:
    def test_dvae_roundtrip_and_filelist_eval(self, tmp_path):
        import numpy as np
        from xtts_tpu.infer.eval_tools import dvae_roundtrip, evaluate_dvae
        from xtts_tpu.utils.registry import load_model
        m, v = load_model("vqvae", TINY)
        mel = np.random.default_rng(0).standard_normal((8, 64)).astype(np.float32)
        r = dvae_roundtrip(m, v, mel)
        assert r["codes"].shape == (16,)          # 4x compression
        assert np.isfinite(r["mel_l1"]) and r["unique_codes"] >= 1
        # filelist eval over cached mels + jsonl output
        paths = []
        for i in range(2):
            p = str(tmp_path / f"c{i}.mel.npy")
            np.save(p, np.random.default_rng(i).standard_normal((8, 40)).astype(np.float32))
            paths.append(p)
        out = str(tmp_path / "eval.jsonl")
        summary = evaluate_dvae(m, v, paths, out_jsonl=out)
        assert summary["n"] == 2 and np.isfinite(summary["mel_l1_mean"])
        assert summary["codebook_usage"] >= 1
        import json
        assert len(open(out).read().splitlines()) == 2
