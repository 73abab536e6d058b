"""CLVP reranker + audio classifier tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import CLVPConfig, ClassifierConfig
from xtts_tpu.models.classifier import AudioClassifier, make_classifier_loss
from xtts_tpu.models.clvp import CLVP, make_clvp_loss

TINY_CLVP = CLVPConfig(dim_text=64, dim_speech=64, dim_latent=32,
                       text_enc_depth=2, speech_enc_depth=2,
                       text_heads=4, speech_heads=4)


@pytest.fixture(scope="module")
def clvp_setup():
    model = CLVP(TINY_CLVP)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 256, (4, 20)).astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 8192, (4, 32)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), text, codes)["params"]
    return model, params, text, codes


class TestCLVP:
    def test_logits_shape(self, clvp_setup):
        model, params, text, codes = clvp_setup
        logits = model.apply({"params": params}, text, codes)
        assert logits.shape == (4, 4)

    def test_loss_scalar_finite(self, clvp_setup):
        model, params, text, codes = clvp_setup
        loss = model.apply({"params": params}, text, codes, return_loss=True)
        assert loss.shape == () and jnp.isfinite(loss)
        # random init: loss should be near log(B)
        assert abs(float(loss) - np.log(4)) < 1.0

    def test_latents_normalized(self, clvp_setup):
        model, params, text, codes = clvp_setup
        tl = model.apply({"params": params}, text, method=model.embed_text)
        np.testing.assert_allclose(np.linalg.norm(tl, axis=-1), 1.0, atol=1e-4)

    def test_masking_changes_pooling(self, clvp_setup):
        model, params, text, codes = clvp_setup
        mask = jnp.ones(text.shape, jnp.int32).at[:, 10:].set(0)
        a = model.apply({"params": params}, text, method=model.embed_text)
        b = model.apply({"params": params}, text, mask,
                        method=model.embed_text)
        assert not np.allclose(a, b)

    def test_mask_invariant_to_padded_content(self, clvp_setup):
        """Padding tokens must not influence the masked latent."""
        model, params, text, codes = clvp_setup
        mask = jnp.ones(text.shape, jnp.int32).at[:, 10:].set(0)
        a = model.apply({"params": params}, text, mask,
                        method=model.embed_text)
        text2 = text.at[:, 10:].set(7)  # mutate only padded region
        b = model.apply({"params": params}, text2, mask,
                        method=model.embed_text)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_rerank_scores(self, clvp_setup):
        model, params, text, codes = clvp_setup
        scores = model.apply({"params": params}, text[0], codes,
                             method=model.rerank)
        assert scores.shape == (4,)
        # rerank must agree with the (1,K) logits row
        row = model.apply({"params": params}, text[:1], codes)[0]
        np.testing.assert_allclose(scores, row, rtol=1e-4, atol=1e-5)

    def test_jit_loss_grad(self, clvp_setup):
        model, params, text, codes = clvp_setup
        loss_fn = make_clvp_loss(model)
        batch = {"text": text, "codes": codes}

        @jax.jit
        def step(p):
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, {}, batch, jax.random.PRNGKey(0))
            return l, g

        l, g = step(params)
        assert jnp.isfinite(l)
        flat = jax.tree_util.tree_leaves(g)
        assert all(jnp.all(jnp.isfinite(x)) for x in flat)


TINY_CLS = ClassifierConfig(base_channels=8, depth=3, resnet_blocks=1,
                            attn_blocks=2, num_attn_heads=2)


class TestClassifier:
    def test_forward_and_loss(self):
        model = AudioClassifier(TINY_CLS)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((2, 64, 100)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), mel)["params"]
        logits = jax.jit(lambda p, m: model.apply({"params": p}, m))(params, mel)
        assert logits.shape == (2, 2)
        loss_fn = make_classifier_loss(model)
        loss, metrics = loss_fn(params, {}, {"mel": mel,
                                             "label": jnp.array([0, 1])}, None)
        assert jnp.isfinite(loss) and 0.0 <= float(metrics["acc"]) <= 1.0

    def test_variable_length(self):
        """Conv pyramid must accept any T without recompmile-breaking ops."""
        model = AudioClassifier(TINY_CLS)
        mel = jnp.zeros((1, 96, 100))
        params = model.init(jax.random.PRNGKey(0), mel)["params"]
        out = model.apply({"params": params}, jnp.zeros((1, 128, 100)))
        assert out.shape == (1, 2)


class TestNoiseScorer:
    def test_score_fn_and_filter(self, tmp_path):
        import numpy as np
        from xtts_tpu.data.prepare import filter_noise
        from xtts_tpu.models.classifier import make_noise_scorer
        model = AudioClassifier(TINY_CLS)
        mel0 = np.random.default_rng(0).standard_normal((2, 64, 100)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(mel0))
        score = make_noise_scorer(model, params, crop_frames=64)
        p = score(np.random.default_rng(1).standard_normal((100, 32)))  # short clip padded
        assert 0.0 <= p <= 1.0
        # end-to-end with filter_noise over cached mel files
        paths = []
        for i in range(3):
            m = np.random.default_rng(i).standard_normal((100, 80)).astype(np.float32)
            path = str(tmp_path / f"m{i}.mel.npy")
            np.save(path, m)
            paths.append(path)
        clean, noisy = filter_noise(paths, score, threshold=0.5)
        assert len(clean) + len(noisy) == 3


class TestClassifierReferenceParity:
    """Golden parity vs ttts/classifier/model.py on converted weights."""

    def test_logits_match_reference(self):
        from ref_stubs import install_reference_stubs
        install_reference_stubs()
        import torch
        from ttts.classifier.model import AudioMiniEncoderWithClassifierHead

        from xtts_tpu.core.config import ClassifierConfig
        from xtts_tpu.models.classifier import AudioClassifier
        from xtts_tpu.utils.convert import classifier_from_reference, to_jax

        cfg = ClassifierConfig(spec_dim=8, classes=2, base_channels=16,
                               depth=2, resnet_blocks=1, attn_blocks=2,
                               num_attn_heads=4, embedding_dim=32,
                               downsample_factor=4, kernel_size=5)
        torch.manual_seed(0)
        ref = AudioMiniEncoderWithClassifierHead(
            cfg.classes, distribute_zero_label=False, spec_dim=cfg.spec_dim,
            embedding_dim=cfg.embedding_dim, base_channels=cfg.base_channels,
            depth=cfg.depth, resnet_blocks=cfg.resnet_blocks,
            attn_blocks=cfg.attn_blocks, num_attn_heads=cfg.num_attn_heads,
            dropout=0, downsample_factor=cfg.downsample_factor,
            kernel_size=cfg.kernel_size)
        ref.eval()
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, cfg.spec_dim, 64)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(mel)).numpy()

        ours = AudioClassifier(cfg)
        params = to_jax({"params": classifier_from_reference(
            ref.state_dict(), cfg)})
        got = ours.apply(params, jnp.swapaxes(jnp.asarray(mel), 1, 2))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_distribute_zero_label_loss_matches(self):
        from ref_stubs import install_reference_stubs
        install_reference_stubs()
        import torch
        from ttts.classifier.model import AudioMiniEncoderWithClassifierHead

        from xtts_tpu.core.config import ClassifierConfig
        from xtts_tpu.models.classifier import (AudioClassifier,
                                                make_classifier_loss)
        from xtts_tpu.utils.convert import classifier_from_reference, to_jax

        cfg = ClassifierConfig(spec_dim=8, classes=2, base_channels=16,
                               depth=1, resnet_blocks=1, attn_blocks=1,
                               num_attn_heads=4, embedding_dim=32,
                               downsample_factor=4, kernel_size=5,
                               distribute_zero_label=True)
        torch.manual_seed(1)
        ref = AudioMiniEncoderWithClassifierHead(
            cfg.classes, distribute_zero_label=True, spec_dim=cfg.spec_dim,
            embedding_dim=cfg.embedding_dim, base_channels=cfg.base_channels,
            depth=cfg.depth, resnet_blocks=cfg.resnet_blocks,
            attn_blocks=cfg.attn_blocks, num_attn_heads=cfg.num_attn_heads,
            dropout=0, downsample_factor=cfg.downsample_factor,
            kernel_size=cfg.kernel_size)
        ref.eval()
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((4, cfg.spec_dim, 32)).astype(np.float32)
        labels = np.array([0, 1, 0, 1])
        with torch.no_grad():
            want = float(ref(torch.from_numpy(mel),
                             torch.from_numpy(labels)))
        ours = AudioClassifier(cfg)
        params = to_jax({"params": classifier_from_reference(
            ref.state_dict(), cfg)})
        loss_fn = make_classifier_loss(ours)
        loss, _ = loss_fn(params["params"], {},
                          {"mel": jnp.swapaxes(jnp.asarray(mel), 1, 2),
                           "label": jnp.asarray(labels)}, None)
        np.testing.assert_allclose(float(loss), want, rtol=2e-4, atol=2e-4)


class TestCLVPCapacityGuards:
    """The live tower's learned position tables bound sequence lengths:
    text by text_seq_len, speech by the num_speech_tokens-sized pos table
    (reference quirk, ttts/clvp/model.py:98). Over-capacity indexing is a
    silent NaN fill under jit, so the model raises at trace time."""

    def test_speech_pos_table_guard(self):
        cfg = CLVPConfig(dim_text=32, dim_speech=32, dim_latent=16,
                         text_enc_depth=1, speech_enc_depth=1,
                         text_heads=2, speech_heads=2, num_speech_tokens=16)
        model = CLVP(cfg)
        text = jnp.zeros((2, 8), jnp.int32)
        ok = jnp.zeros((2, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), text, ok)["params"]
        too_long = jnp.zeros((2, 17), jnp.int32)
        with pytest.raises(ValueError, match="num_speech_tokens"):
            model.apply({"params": params}, text, too_long)

    def test_text_seq_len_guard(self):
        cfg = CLVPConfig(dim_text=32, dim_speech=32, dim_latent=16,
                         text_enc_depth=1, speech_enc_depth=1,
                         text_heads=2, speech_heads=2, text_seq_len=12)
        model = CLVP(cfg)
        codes = jnp.zeros((2, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 12), jnp.int32), codes)["params"]
        with pytest.raises(ValueError, match="text_seq_len"):
            model.apply({"params": params},
                        jnp.zeros((2, 13), jnp.int32), codes)
