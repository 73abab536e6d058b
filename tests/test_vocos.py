"""Vocos vocoder tests (small config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import VocosConfig
from xtts_tpu.models.vocos import Vocos

CFG = VocosConfig(input_channels=100, dim=64, intermediate_dim=128,
                  num_layers=2, n_fft=1024, hop_length=256)


@pytest.fixture(scope="module")
def model_and_vars():
    model = Vocos(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 100, 16)))
    return model, variables


def test_decode_shape(model_and_vars, rng):
    model, variables = model_and_vars
    mel = jnp.asarray(rng.standard_normal((2, 100, 16)).astype(np.float32))
    wav = model.apply(variables, mel)
    # "same" padding ISTFT: samples = T * hop (trimmed (win-hop)/2 per side
    # from (T-1)*hop + win)
    assert wav.shape == (2, 16 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_silence_bounded(model_and_vars):
    model, variables = model_and_vars
    wav = model.apply(variables, jnp.full((1, 100, 8), np.log(1e-5)))
    assert np.abs(np.asarray(wav)).max() < 100  # exp-mag clip keeps it sane


def test_jit_decode(model_and_vars, rng):
    model, variables = model_and_vars
    mel = jnp.asarray(rng.standard_normal((1, 100, 12)).astype(np.float32))
    f = jax.jit(lambda v, m: model.apply(v, m))
    w1 = f(variables, mel)
    w2 = model.apply(variables, mel)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


class TestEncodecVariant:
    """Encodec-conditioned Vocos variant (feature_extractors.py:124-168,
    modules.py:63-87, models.py:100-127)."""

    def test_encodec_features_matches_torch_offset_embedding(self):
        import torch
        from xtts_tpu.models.vocos import encodec_features
        rng = np.random.default_rng(0)
        num_q, bins, d, b, t = 3, 16, 8, 2, 5
        weights = rng.standard_normal((num_q * bins, d)).astype(np.float32)
        codes = rng.integers(0, bins, (num_q, b, t))
        # reference math (ttts/vocoder/feature_extractors.py:161-168)
        offsets = torch.arange(0, bins * num_q, bins)
        idx = torch.from_numpy(codes) + offsets.view(-1, 1, 1)
        want = torch.nn.functional.embedding(
            idx, torch.from_numpy(weights)).sum(dim=0).transpose(1, 2)
        got = encodec_features(jnp.asarray(codes, jnp.int32),
                               jnp.asarray(weights), bins)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6)

    def test_encodec_feature_extractor_injectable(self):
        from xtts_tpu.models.vocos import EncodecFeatures
        rng = np.random.default_rng(1)
        bins, num_q, d = 8, 2, 4
        weights = rng.standard_normal((num_q * bins, d)).astype(np.float32)
        seen = {}

        def encode_fn(audio, bandwidth):
            seen["bw"] = bandwidth
            return rng.integers(0, bins, (num_q, audio.shape[0], 6))

        fx = EncodecFeatures(encode_fn, weights, bins=bins)
        feats = fx(jnp.zeros((2, 240)), bandwidth_id=2)
        assert feats.shape == (2, d, 6)
        assert seen["bw"] == 6.0

    def test_adanorm_backbone_and_resnet_backbone(self):
        from xtts_tpu.core.config import VocosConfig
        from xtts_tpu.models.vocos import VocosBackbone, VocosResNetBackbone
        cfg = VocosConfig(input_channels=8, dim=16, intermediate_dim=32,
                          num_layers=2)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (2, 12, 8)).astype(np.float32))
        bb = VocosBackbone(cfg, adanorm_num_embeddings=4)
        params = bb.init(jax.random.PRNGKey(0), x, jnp.array(1))
        y = bb.apply(params, x, jnp.array(3))
        assert y.shape == (2, 12, 16)
        # different bandwidth ids give different outputs after init noise
        params = jax.tree.map(
            lambda p: p + 0.1 * np.random.default_rng(0).standard_normal(
                p.shape).astype(p.dtype), params)
        y0 = bb.apply(params, x, jnp.array(0))
        y1 = bb.apply(params, x, jnp.array(2))
        assert float(jnp.abs(y0 - y1).max()) > 1e-4

        rb = VocosResNetBackbone(cfg, num_blocks=2)
        p2 = rb.init(jax.random.PRNGKey(1), x)
        z = rb.apply(p2, x)
        assert z.shape == (2, 12, 16)
        assert np.isfinite(np.asarray(z)).all()

    def test_adanorm_matches_torch(self):
        import torch
        from xtts_tpu.models.vocos import AdaLayerNorm
        rng = np.random.default_rng(3)
        dim, n_emb = 8, 4
        x = rng.standard_normal((2, 5, dim)).astype(np.float32)
        scale = rng.standard_normal((n_emb, dim)).astype(np.float32)
        shift = rng.standard_normal((n_emb, dim)).astype(np.float32)
        m = AdaLayerNorm(n_emb, dim)
        params = {"params": {
            "scale": {"embedding": jnp.asarray(scale)},
            "shift": {"embedding": jnp.asarray(shift)},
        }}
        got = m.apply(params, jnp.asarray(x), jnp.array(2))
        want = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (dim,), eps=1e-6)
        want = want * torch.from_numpy(scale[2]) + torch.from_numpy(shift[2])
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5,
                                   atol=2e-5)


class TestFourierHeads:
    def test_imdct_head_facade(self):
        """Vocos with the IMDCT heads (ttts/vocoder/heads.py:70-157):
        same decode surface, samples = frames * mdct_frame_len//2."""
        from xtts_tpu.core.config import VocosConfig

        for head in ("imdct_symexp", "imdct_cos"):
            cfg = VocosConfig(input_channels=12, dim=16, intermediate_dim=32,
                              num_layers=1, head=head, mdct_frame_len=32,
                              head_sample_rate=(24000 if "sym" in head
                                                else None))
            m = Vocos(cfg)
            mel = jnp.asarray(np.random.default_rng(0)
                              .standard_normal((2, 12, 10), ).astype(np.float32))
            v = m.init(jax.random.PRNGKey(0), mel)
            wav = m.apply(v, mel)
            assert wav.shape == (2, 10 * 16)
            assert np.isfinite(np.asarray(wav)).all()

    def test_unknown_head_rejected(self):
        from xtts_tpu.core.config import VocosConfig
        with pytest.raises(ValueError, match="unknown Vocos head"):
            Vocos(VocosConfig(head="dct")).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 100, 4)))

    def test_clip_audio(self):
        from xtts_tpu.core.config import VocosConfig
        cfg = VocosConfig(input_channels=8, dim=16, intermediate_dim=32,
                          num_layers=1, head="imdct_cos", mdct_frame_len=32,
                          clip_audio=True)
        m = Vocos(cfg)
        mel = jnp.asarray(np.random.default_rng(1)
                          .standard_normal((1, 8, 6)).astype(np.float32) * 5)
        wav = m.apply(m.init(jax.random.PRNGKey(0), mel), mel)
        assert float(jnp.abs(wav).max()) <= 1.0
