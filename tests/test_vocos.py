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
