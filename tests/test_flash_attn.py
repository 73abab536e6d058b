"""flash_mha wrapper semantics (pad + segment-mask + slice).

The Mosaic kernel itself cannot run on CPU; these tests pin the wrapper's
padding/masking/slicing against plain unpadded attention using the
reference core (identical masking semantics, same code path the on-chip
A/B uses as its numerics baseline — scripts/ab_flash_attn.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.nn.flash_attn import _round_up, flash_mha


def plain_attention(q, k, v, scale):
    sim = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bjhd->bihd", attn, v)


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    mk = lambda t: jnp.asarray(
        rng.standard_normal((2, t, 2, 8)).astype(np.float32))
    return mk(130), mk(150), mk(150)  # both seqs need padding to 256


class TestFlashMHAWrapper:
    def test_reference_core_matches_plain(self, qkv):
        q, k, v = qkv
        out = flash_mha(q, k, v, 8 ** -0.5, core="reference")
        want = plain_attention(q, k, v, 8 ** -0.5)
        assert out.shape == q.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_no_padding_path(self):
        rng = np.random.default_rng(1)
        mk = lambda t: jnp.asarray(
            rng.standard_normal((1, t, 2, 8)).astype(np.float32))
        q, k, v = mk(128), mk(256), mk(256)  # already block multiples
        out = flash_mha(q, k, v, 8 ** -0.5, core="reference")
        want = plain_attention(q, k, v, 8 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_grads_match_plain(self, qkv):
        """Training goes through the same consumer attention — the wrapper
        must be padding-transparent under grad too."""
        q, k, v = qkv

        def loss_wrapped(q_, k_, v_):
            return jnp.sum(flash_mha(q_, k_, v_, 8 ** -0.5,
                                     core="reference") ** 2)

        def loss_plain(q_, k_, v_):
            return jnp.sum(plain_attention(q_, k_, v_, 8 ** -0.5) ** 2)

        gw = jax.grad(loss_wrapped, argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gw, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_round_up(self):
        assert _round_up(1200, 128) == 1280
        assert _round_up(1500, 128) == 1536
        assert _round_up(1536, 128) == 1536


def test_gate_off_on_cpu():
    """On CPU the CrossAttention gate must stay on the einsum path."""
    from xtts_tpu.models.aa_diffusion import _use_flash
    assert not _use_flash(1200, 1500)  # backend is cpu under conftest
