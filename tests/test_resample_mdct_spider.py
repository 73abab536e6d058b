"""Timestep resamplers, MDCT/IMDCT, crawler-interface tests."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.data.spider import crawl_episode_urls, download_audio
from xtts_tpu.diffusion.resample import (LossSecondMomentResampler,
                                         UniformSampler)
from xtts_tpu.dsp.spectral import imdct, mdct


class TestTimestepSamplers:
    def test_uniform(self):
        s = UniformSampler(100)
        t, w = s.sample(jax.random.PRNGKey(0), 16)
        assert t.shape == (16,) and ((t >= 0) & (t < 100)).all()
        np.testing.assert_array_equal(np.asarray(w), 1.0)

    def test_loss_aware_warmup_is_uniform(self):
        s = LossSecondMomentResampler(10, history_per_term=2)
        st = s.init_state()
        w = np.asarray(s.weights(st))
        np.testing.assert_allclose(w, 0.1, atol=1e-6)

    def test_loss_aware_prefers_high_loss_t(self):
        s = LossSecondMomentResampler(4, history_per_term=2,
                                      uniform_prob=0.0)
        st = s.init_state()
        # fill history: t=3 has 10x the loss of others
        for _ in range(2):
            for t_val, l in ((0, 1.0), (1, 1.0), (2, 1.0), (3, 10.0)):
                st = s.update(st, jnp.array([t_val]), jnp.array([l]))
        w = np.asarray(s.weights(st))
        assert w[3] > 3 * w[0]
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)

    def test_importance_weights_debias(self):
        s = LossSecondMomentResampler(4, history_per_term=1)
        st = s.init_state()
        for t_val in range(4):
            st = s.update(st, jnp.array([t_val]), jnp.array([float(t_val + 1)]))
        t, w = s.sample(jax.random.PRNGKey(0), 1000, st)
        # E[w] over samples ~ 1 (unbiased estimator of the uniform mean)
        assert abs(float(jnp.mean(w)) - 1.0) < 0.15

    def test_state_is_jittable(self):
        s = LossSecondMomentResampler(8, history_per_term=2)

        @jax.jit
        def step(st, key):
            t, w = s.sample(key, 4, st)
            return s.update(st, t, jnp.ones((4,))), w

        st = s.init_state()
        st, w = step(st, jax.random.PRNGKey(0))
        assert jnp.isfinite(w).all()


class TestMDCT:
    def test_roundtrip_interior(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
        y = imdct(mdct(x, 64), 64)
        a, b = np.asarray(y)[:, 32:990], np.asarray(x)[:, 32:990]
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_shapes(self):
        c = mdct(jnp.zeros((1, 512)), 32)
        assert c.shape[2] == 16
        assert imdct(c, 32).shape == (1, 512)


class TestSpider:
    def test_listing_required(self, tmp_path):
        with pytest.raises(RuntimeError, match="listing backend"):
            crawl_episode_urls(["http://x"], str(tmp_path / "u.jsonl"))

    def test_crawl_and_download_with_injected_backends(self, tmp_path):
        out = str(tmp_path / "urls.jsonl")
        n = crawl_episode_urls(
            ["http://ch1", "http://ch2"], out,
            listing_fn=lambda ch: [f"{ch}/ep1.mp3", f"{ch}/ep2.mp3"])
        assert n == 4
        paths = download_audio(out, str(tmp_path / "dl"),
                               fetch_fn=lambda url: url.encode())
        assert len(paths) == 4
        assert open(paths[0], "rb").read() == b"http://ch1/ep1.mp3"
        # resume: second run skips existing
        paths2 = download_audio(out, str(tmp_path / "dl"),
                                fetch_fn=lambda url: (_ for _ in ()).throw(
                                    AssertionError("should not refetch")))
        assert paths2 == paths
