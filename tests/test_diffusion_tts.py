"""Golden parity: models.diffusion_tts.DiffusionTts vs the reference legacy
tortoise denoiser (ttts/diffusion/model.py:134-341) on shared converted
weights — eps/var output, code & latent conditioning paths, conditioning-free
branch, timestep_independent, get_conditioning.
"""
import numpy as np
import pytest
import torch

from ref_stubs import install_reference_stubs

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ttts.diffusion import model as ref_model  # noqa: E402

from xtts_tpu.models.diffusion_tts import DiffusionTts  # noqa: E402
from xtts_tpu.utils.convert import (diffusion_tts_from_reference,  # noqa: E402
                                    to_jax)

MC, LAYERS, IN_CH, LAT_CH, TOKENS, HEADS = 32, 2, 8, 16, 50, 4
B, T = 2, 12


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = ref_model.DiffusionTts(
        model_channels=MC, num_layers=LAYERS, in_channels=IN_CH,
        in_latent_channels=LAT_CH, in_tokens=TOKENS, out_channels=2 * IN_CH,
        dropout=0, num_heads=HEADS, layer_drop=0, unconditioned_percentage=0)
    ref.eval()
    sd = ref.state_dict()
    ours = DiffusionTts(model_channels=MC, num_layers=LAYERS,
                        in_channels=IN_CH, in_latent_channels=LAT_CH,
                        in_tokens=TOKENS, out_channels=2 * IN_CH,
                        num_heads=HEADS, layer_drop=0.0,
                        unconditioned_percentage=0.0)
    params = to_jax({"params": diffusion_tts_from_reference(sd, LAYERS)})
    return ref, ours, params


def data():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, IN_CH, T)).astype(np.float32)
    cond_mel = rng.standard_normal((B, IN_CH, 20)).astype(np.float32)
    latent = rng.standard_normal((B, LAT_CH, 6)).astype(np.float32)
    codes = rng.integers(0, TOKENS, (B, 5))
    ts = np.array([3, 40], np.int64)
    return x, cond_mel, latent, codes, ts


def test_param_cover(pair):
    ref, ours, params = pair
    x, cond_mel, latent, codes, ts = data()
    want = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ts),
                     aligned_conditioning=jnp.asarray(latent),
                     conditioning_latent=jnp.asarray(cond_mel))
    ws = jax.tree_util.tree_structure(want["params"])
    ps = jax.tree_util.tree_structure(params["params"])
    assert ws == ps


def test_latent_conditioning_parity(pair):
    ref, ours, params = pair
    x, cond_mel, latent, codes, ts = data()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(ts),
                   torch.from_numpy(latent), torch.from_numpy(cond_mel))
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(ts),
                     aligned_conditioning=jnp.asarray(latent),
                     conditioning_latent=jnp.asarray(cond_mel))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_code_conditioning_parity(pair):
    ref, ours, params = pair
    x, cond_mel, latent, codes, ts = data()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(ts),
                   torch.from_numpy(codes), torch.from_numpy(cond_mel))
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(ts),
                     aligned_conditioning=jnp.asarray(codes, jnp.int32),
                     conditioning_latent=jnp.asarray(cond_mel))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_conditioning_free_parity(pair):
    ref, ours, params = pair
    x, cond_mel, latent, codes, ts = data()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(ts),
                   torch.from_numpy(latent), torch.from_numpy(cond_mel),
                   conditioning_free=True)
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(ts),
                     aligned_conditioning=jnp.asarray(latent),
                     conditioning_latent=jnp.asarray(cond_mel),
                     conditioning_free=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_precomputed_embeddings_and_code_pred(pair):
    ref, ours, params = pair
    x, cond_mel, latent, codes, ts = data()
    with torch.no_grad():
        cl = ref.get_conditioning(torch.from_numpy(cond_mel))
        emb_ref, mel_pred_ref = ref.timestep_independent(
            torch.from_numpy(latent), cl, T, True)
        want = ref(torch.from_numpy(x), torch.from_numpy(ts),
                   precomputed_aligned_embeddings=emb_ref)
    cl_j = ours.apply(params, jnp.asarray(cond_mel),
                      method=ours.get_conditioning)
    np.testing.assert_allclose(np.asarray(cl_j), cl.numpy(), rtol=2e-4,
                               atol=2e-4)
    emb_j, mel_pred_j = ours.apply(
        params, jnp.asarray(latent), cl_j, T, True,
        method=ours.timestep_independent)
    # ours is channels-last internally
    np.testing.assert_allclose(np.swapaxes(np.asarray(emb_j), 1, 2),
                               emb_ref.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mel_pred_j), mel_pred_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(ts),
                     precomputed_aligned_embeddings=emb_j)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_train_mode_regularizers_run(pair):
    """layer_drop + uncond dropout paths execute under the rng collections
    (shape smoke; stochastic, no reference equivalence in eval)."""
    _, _, params = pair
    x, cond_mel, latent, codes, ts = data()
    m = DiffusionTts(model_channels=MC, num_layers=LAYERS, in_channels=IN_CH,
                     in_latent_channels=LAT_CH, in_tokens=TOKENS,
                     out_channels=2 * IN_CH, num_heads=HEADS, layer_drop=0.5,
                     unconditioned_percentage=0.5)
    out = m.apply(params, jnp.asarray(x), jnp.asarray(ts),
                  aligned_conditioning=jnp.asarray(latent),
                  conditioning_latent=jnp.asarray(cond_mel), train=True,
                  rngs={"drop": jax.random.PRNGKey(1),
                        "uncond": jax.random.PRNGKey(2),
                        "dropout": jax.random.PRNGKey(3)})
    assert out.shape == (B, 2 * IN_CH, T)
    assert np.isfinite(np.asarray(out)).all()
