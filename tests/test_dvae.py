"""DVAE + VQ op tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import DVAEConfig
from xtts_tpu.models.dvae import (
    DVAE, CodebookState, ema_codebook_update, init_codebook, quantize, ssim,
)
from xtts_tpu.ops.vq import vq_nearest_pallas, vq_nearest_xla, vq_soft_codes

CFG_SMALL = DVAEConfig(channels=100, num_tokens=128, hidden_dim=32,
                       num_resnet_blocks=2, codebook_dim=64, num_layers=2)


class TestVQOp:
    def test_xla_matches_bruteforce(self, rng):
        x = rng.standard_normal((37, 16)).astype(np.float32)
        e = rng.standard_normal((16, 50)).astype(np.float32)
        dist = ((x ** 2).sum(1, keepdims=True) - 2 * x @ e + (e ** 2).sum(0))
        expect = dist.argmin(1)
        got = np.asarray(vq_nearest_xla(jnp.asarray(x), jnp.asarray(e)))
        np.testing.assert_array_equal(got, expect)

    def test_pallas_interpret_matches_xla(self, rng):
        x = rng.standard_normal((300, 64)).astype(np.float32)
        e = rng.standard_normal((64, 700)).astype(np.float32)
        ref = np.asarray(vq_nearest_xla(jnp.asarray(x), jnp.asarray(e)))
        got = np.asarray(vq_nearest_pallas(jnp.asarray(x), jnp.asarray(e),
                                           interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_pallas_under_value_and_grad(self, rng):
        """Regression: on TPU trainers, value_and_grad traced the Pallas VQ
        call with nonzero input tangents and hit Pallas's unimplemented JVP
        rule (AssertionError). vq_nearest stop-grads its inputs so the JVP
        trace short-circuits; this exercises the exact TPU dispatch body."""
        x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
        e = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))

        def loss(x):
            xs = jax.lax.stop_gradient(x)
            es = jax.lax.stop_gradient(e)
            codes = vq_nearest_pallas(xs, es, interpret=True)
            q = jax.nn.one_hot(codes, 32) @ es.T
            return jnp.sum((q - x) ** 2)

        v, g = jax.value_and_grad(loss)(x)
        assert np.isfinite(float(v)) and g.shape == x.shape

    def test_tie_break_first_index(self):
        # two identical codes -> argmin must pick the first
        e = np.zeros((4, 8), np.float32)
        e[:, 3] = 1.0
        e[:, 5] = 1.0  # same code duplicated at 3 and 5
        x = np.ones((2, 4), np.float32)
        got = np.asarray(vq_nearest_xla(jnp.asarray(x), jnp.asarray(e)))
        assert (got == 3).all()

    def test_soft_codes_shape(self, rng):
        x = rng.standard_normal((5, 7, 16)).astype(np.float32)
        e = rng.standard_normal((16, 32)).astype(np.float32)
        sc = vq_soft_codes(jnp.asarray(x), jnp.asarray(e))
        assert sc.shape == (5, 7, 32)
        codes = np.asarray(jnp.argmax(sc, -1))
        np.testing.assert_array_equal(
            codes.reshape(-1),
            np.asarray(vq_nearest_xla(jnp.asarray(x.reshape(-1, 16)), jnp.asarray(e))))


class TestQuantize:
    def test_straight_through_gradient(self, rng):
        cb = init_codebook(jax.random.PRNGKey(0), 8, 16)
        x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))

        def loss(x):
            q = quantize(x, cb)
            return jnp.sum(q.quantized ** 2)

        g = jax.grad(loss)(x)
        # straight-through: grad flows as if quantized == x
        q = quantize(x, cb)
        np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(q.quantized), rtol=1e-5)

    def test_ema_update_matches_reference_math(self, rng):
        dim, n_embed, decay, eps = 8, 16, 0.99, 1e-5
        cb = init_codebook(jax.random.PRNGKey(1), dim, n_embed)
        x = jnp.asarray(rng.standard_normal((4, 6, dim)).astype(np.float32))
        q = quantize(x, cb)
        new = ema_codebook_update(cb, q.onehot_sum, q.embed_sum, decay, eps)

        # replicate ttts/vqvae/xtts_dvae.py:104-117 in numpy
        flat = np.asarray(x).reshape(-1, dim)
        onehot = np.eye(n_embed, dtype=np.float32)[np.asarray(q.codes).reshape(-1)]
        cs = np.asarray(cb.cluster_size) * decay + onehot.sum(0) * (1 - decay)
        ea = np.asarray(cb.embed_avg) * decay + (flat.T @ onehot) * (1 - decay)
        n = cs.sum()
        smoothed = (cs + eps) / (n + n_embed * eps) * n
        np.testing.assert_allclose(np.asarray(new.embed), ea / smoothed[None, :], rtol=1e-5)

    def test_codes_in_range(self, rng):
        cb = init_codebook(jax.random.PRNGKey(2), 8, 16)
        x = jnp.asarray(rng.standard_normal((3, 10, 8)).astype(np.float32))
        q = quantize(x, cb)
        assert q.codes.shape == (3, 10)
        assert (np.asarray(q.codes) >= 0).all() and (np.asarray(q.codes) < 16).all()


class TestDVAE:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = DVAE(CFG_SMALL)
        mel = jnp.zeros((2, 100, 64))
        variables = model.init(jax.random.PRNGKey(0), mel)
        return model, variables

    def test_roundtrip_shapes(self, model_and_vars, rng):
        model, variables = model_and_vars
        mel = jnp.asarray(rng.standard_normal((2, 100, 64)).astype(np.float32))
        codes = model.apply(variables, mel, method=model.get_codebook_indices)
        assert codes.shape == (2, 16)  # 4x temporal compression
        recon, penult = model.apply(variables, codes, method=model.decode)
        assert recon.shape == (2, 100, 64)
        assert penult.shape[0] == 2 and penult.shape[2] == 64

    def test_training_forward(self, model_and_vars, rng):
        model, variables = model_and_vars
        mel = jnp.asarray(rng.standard_normal((2, 100, 64)).astype(np.float32))
        recon, ssim_l, commit, out, (osum, esum) = model.apply(variables, mel)
        assert np.isfinite(float(recon)) and np.isfinite(float(commit))
        assert float(ssim_l) >= 0
        assert osum.shape == (CFG_SMALL.num_tokens,)
        assert esum.shape == (CFG_SMALL.codebook_dim, CFG_SMALL.num_tokens)
        assert float(osum.sum()) == pytest.approx(2 * 16)  # one code per position

    def test_odd_length_truncation(self, model_and_vars, rng):
        model, variables = model_and_vars
        mel = jnp.asarray(rng.standard_normal((1, 100, 62)).astype(np.float32))
        recon, *_ = model.apply(variables, mel)[:1]
        assert np.isfinite(float(recon))


def test_ssim_identity():
    img = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 32, 32)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    other = img + 1.0
    assert float(ssim(img, other)) < 1.0


class TestBalancingHeuristic:
    """xtts_dvae.py:53-85 Quantize(balancing_heuristic=True) — tumbling-
    window faithful form (models/dvae.py balance_codebook)."""

    def test_no_reset_below_window(self):
        from xtts_tpu.models.dvae import BalanceState, balance_codebook
        cb = init_codebook(jax.random.PRNGKey(0), 8, 16)
        bal = BalanceState(jnp.zeros((16,)), jnp.zeros(()))
        counts = jnp.full((16,), 10.0)         # 160 codes << window
        new_cb, new_bal, n = balance_codebook(cb, bal, counts,
                                              jax.random.PRNGKey(1),
                                              window=1000)
        assert int(n) == 0
        np.testing.assert_array_equal(np.asarray(new_cb.embed),
                                      np.asarray(cb.embed))
        assert float(new_bal.total) == 160.0   # accumulating

    def test_reset_at_boundary(self):
        from xtts_tpu.models.dvae import BalanceState, balance_codebook
        cb = init_codebook(jax.random.PRNGKey(0), 8, 16)
        cb = cb._replace(cluster_size=jnp.ones((16,)))
        bal = BalanceState(jnp.zeros((16,)), jnp.zeros(()))
        # code 0 takes 95% of the window (> 0.9 -> reset); codes 1..13
        # share the rest ~0.38% each (< 1% -> reset); give 14/15 enough
        # to clear both thresholds
        counts = np.zeros(16, np.float32)
        counts[0] = 950.0
        counts[14] = 25.0
        counts[15] = 25.0
        counts[1:14] = 50.0 / 13
        new_cb, new_bal, n = balance_codebook(
            cb, bal, jnp.asarray(counts * 2), jax.random.PRNGKey(1),
            window=1000, hi=0.9, lo=0.02)
        n = int(n)
        assert n == 14                          # 0 and 1..13 reset
        e = np.asarray(new_cb.embed)
        a = np.asarray(new_cb.embed_avg)
        c = np.asarray(new_cb.cluster_size)
        # reset codes: embed == embed_avg == fresh gaussian, cluster zeroed
        np.testing.assert_array_equal(e[:, 0], a[:, 0])
        assert not np.allclose(e[:, 0], np.asarray(cb.embed)[:, 0])
        assert c[0] == 0.0
        # surviving codes untouched
        np.testing.assert_array_equal(e[:, 14], np.asarray(cb.embed)[:, 14])
        assert c[14] == 1.0
        # window restarted
        assert float(new_bal.total) == 0.0

    def test_dvae_loss_threads_balance_state(self, rng):
        from xtts_tpu.train.steps import make_dvae_loss
        cfg = DVAEConfig(channels=16, num_tokens=32, hidden_dim=16,
                         num_resnet_blocks=1, codebook_dim=16, num_layers=2,
                         balancing_heuristic=True, balance_window=64)
        model = DVAE(cfg)
        mel = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), mel)
        assert "bal_hist" in v["codebook"]
        loss_fn = make_dvae_loss(model)
        (loss, aux), _ = jax.value_and_grad(loss_fn, has_aux=True)(
            v["params"], {"codebook": v["codebook"]}, {"mel": mel},
            jax.random.PRNGKey(1))
        cols = aux["new_state_cols"]["codebook"]
        assert np.isfinite(float(loss))
        # 2*8=16 codes this step, window 64: still accumulating
        assert float(cols["bal_total"]) > 0
        # a second step past the boundary resets and restarts the window
        cols2 = {"codebook": dict(cols)}
        big = {"mel": jnp.tile(mel, (4, 1, 16))}
        (_, aux2), _ = jax.value_and_grad(loss_fn, has_aux=True)(
            v["params"], cols2, big, jax.random.PRNGKey(2))
        assert float(aux2["new_state_cols"]["codebook"]["bal_total"]) == 0.0
