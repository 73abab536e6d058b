"""Gaussian diffusion process tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.diffusion.gaussian import (
    GaussianDiffusion, _normal_kl, get_named_beta_schedule, space_timesteps,
)


def dummy_model(x, t):
    """eps = 0, var_frac = -1 (minimum variance)."""
    return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=1)


class TestSchedules:
    def test_linear_schedule_values(self):
        betas = get_named_beta_schedule("linear", 1000)
        assert betas[0] == pytest.approx(0.0001)
        assert betas[-1] == pytest.approx(0.02)
        assert len(betas) == 1000

    def test_space_timesteps_50(self):
        use = space_timesteps(1000, [50])
        assert len(use) == 50
        assert 0 in use and 999 in use

    def test_spaced_diffusion_alphas_match(self):
        gd = GaussianDiffusion.spaced(1000, 50)
        base = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
        np.testing.assert_allclose(
            gd.alphas_cumprod, base.alphas_cumprod[gd.timestep_map], rtol=1e-10)
        assert gd.num_timesteps == 50
        assert gd.original_num_steps == 1000


class TestQProcess:
    def test_q_sample(self):
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
        x0 = jnp.ones((2, 3, 8))
        noise = jnp.full_like(x0, 0.5)
        t = jnp.array([10, 50])
        xt = gd.q_sample(x0, t, noise)
        for b, ti in enumerate([10, 50]):
            expect = (np.sqrt(gd.alphas_cumprod[ti]) * 1.0
                      + np.sqrt(1 - gd.alphas_cumprod[ti]) * 0.5)
            np.testing.assert_allclose(np.asarray(xt[b]), expect, rtol=1e-5)

    def test_xstart_from_eps_roundtrip(self, rng):
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
        x0 = jnp.asarray(rng.standard_normal((2, 3, 8)).astype(np.float32))
        noise = jnp.asarray(rng.standard_normal((2, 3, 8)).astype(np.float32))
        t = jnp.array([20, 70])
        xt = gd.q_sample(x0, t, noise)
        rec = gd.predict_xstart_from_eps(xt, t, noise)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


class TestSampling:
    @pytest.mark.parametrize("sampler", ["p", "ddim", "dpm++2m", "unipc",
                                         "dpm++2m_solver", "dpm++3m",
                                         "dpm++fast", "unipc_bh1",
                                         "unipc_bh2", "unipc_vary"])
    def test_loop_shapes_finite(self, sampler):
        gd = GaussianDiffusion.spaced(1000, 10)
        x = gd.sample_loop(dummy_model, (2, 4, 16), jax.random.PRNGKey(0),
                           sampler=sampler)
        assert x.shape == (2, 4, 16)
        assert np.isfinite(np.asarray(x)).all()

    def test_ode_samplers_agree_on_known_target(self):
        """With a perfect denoiser toward x0=0.7, every ODE sampler must land
        on the target; UniPC (order 2 corrected) at least as tight as DDIM."""
        target = 0.7

        def perfect(x, t_orig):
            # eps consistent with x0 = target at any t
            acp = jnp.asarray(
                np.cumprod(1 - np.asarray(
                    GaussianDiffusion.spaced(1000, 1000).betas)), jnp.float32)
            # solver-backed samplers feed float base-schedule times
            ti = jnp.clip(jnp.round(t_orig).astype(jnp.int32), 0, 999)
            ab = acp[ti].reshape(-1, 1, 1)
            eps = (x - jnp.sqrt(ab) * target) / jnp.sqrt(1 - ab)
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

        errs = {}
        for sampler in ("ddim", "dpm++2m", "unipc", "dpm++2m_solver",
                        "dpm++3m", "dpm++fast", "unipc_bh1", "unipc_bh2",
                        "unipc_vary"):
            gd = GaussianDiffusion.spaced(1000, 8)
            x = gd.sample_loop(perfect, (1, 1, 8), jax.random.PRNGKey(0),
                               sampler=sampler)
            errs[sampler] = float(np.abs(np.asarray(x) - target).max())
        for s, e in errs.items():
            assert e < 0.05, (s, e)
        assert errs["unipc"] <= errs["ddim"] + 1e-6

    def test_cfg_mix(self):
        gd = GaussianDiffusion.spaced(1000, 10, conditioning_free=True,
                                      conditioning_free_k=2.0)

        def cond(x, t):
            return jnp.concatenate([jnp.ones_like(x), -jnp.ones_like(x)], 1)

        def uncond(x, t):
            return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], 1)

        out = gd.p_mean_variance_from_output(
            cond(jnp.zeros((1, 2, 4)), None), jnp.zeros((1, 2, 4)),
            jnp.array([5]), uncond(jnp.zeros((1, 2, 4)), None))
        # the reference ramps on the SPACED index over the spaced count
        # (ttts/utils/diffusion.py:352; pinned by test_reference_parity)
        cfk = 2.0 * (1 - 5 / gd.num_timesteps)
        # eps = (1+cfk)*1 - cfk*0 = 1+cfk
        np.testing.assert_allclose(np.asarray(out["eps"]), 1 + cfk, rtol=1e-5)

    def test_p_loop_unroll_is_numerics_neutral(self, monkeypatch):
        """XTTS_SCAN_UNROLL only changes XLA scheduling (prefetch overlap),
        never the math: unrolled and rolled loops must agree bitwise."""
        gd = GaussianDiffusion.spaced(1000, 10, conditioning_free=True,
                                      conditioning_free_k=2.0)

        def paired(x, t_orig):
            return dummy_model(x, t_orig), dummy_model(x * 0.9, t_orig)

        monkeypatch.delenv("XTTS_SCAN_UNROLL", raising=False)
        x1 = gd.p_sample_loop(paired, (2, 4, 16), jax.random.PRNGKey(3))
        monkeypatch.setenv("XTTS_SCAN_UNROLL", "2")
        x2 = gd.p_sample_loop(paired, (2, 4, 16), jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_dummy_model_p_loop_converges_to_zero(self):
        # eps=0 prediction means x0_hat = x/sqrt(acp) clipped; ancestral loop
        # should stay bounded
        gd = GaussianDiffusion.spaced(1000, 25)
        x = gd.p_sample_loop(dummy_model, (1, 2, 8), jax.random.PRNGKey(1))
        assert np.abs(np.asarray(x)).max() < 10


class TestTrainingLosses:
    def test_finite_and_shaped(self, rng):
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
        x0 = jnp.asarray(rng.standard_normal((4, 3, 16)).astype(np.float32) * 0.5)
        t = jnp.array([0, 10, 500, 999])
        terms = gd.training_losses(dummy_model, x0, t, jax.random.PRNGKey(0))
        assert terms["loss"].shape == (4,)
        assert np.isfinite(np.asarray(terms["loss"])).all()
        assert (np.asarray(terms["mse"]) >= 0).all()

    def test_perfect_model_zero_mse(self, rng):
        gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
        x0 = jnp.asarray(rng.standard_normal((2, 3, 16)).astype(np.float32))
        key = jax.random.PRNGKey(3)
        noise = jax.random.normal(key, x0.shape)  # same key used internally

        def oracle(x, t):
            return jnp.concatenate([noise, -jnp.ones_like(x)], axis=1)

        terms = gd.training_losses(oracle, x0, jnp.array([100, 400]), key)
        np.testing.assert_allclose(np.asarray(terms["mse"]), 0, atol=1e-10)


def test_normal_kl_identity():
    m = jnp.array([0.3, -1.0])
    lv = jnp.array([0.1, 0.5])
    np.testing.assert_allclose(np.asarray(_normal_kl(m, lv, m, lv)), 0, atol=1e-7)
