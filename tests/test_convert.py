"""Weight-conversion parity: our GPT2Stack must reproduce HF torch GPT2Model
hidden states bit-closely when loaded with converted weights.

This is the strongest available numerics check without the reference's
checkpoint blobs (they are .MISSING_LARGE_BLOBS in the snapshot): a randomly
initialized torch GPT2 is converted and compared on the same inputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from xtts_tpu.nn.transformer import GPT2Stack, KVCache
from xtts_tpu.utils.convert import hf_gpt2_to_stack, to_jax

LAYERS, DIM, HEADS = 2, 64, 4


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.GPT2Config(
        n_embd=DIM, n_layer=LAYERS, n_head=HEADS, n_positions=64,
        vocab_size=50, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    m = transformers.GPT2Model(cfg)
    m.eval()
    return m


def test_hidden_state_parity(hf_model):
    sd = hf_model.state_dict()
    params = to_jax(hf_gpt2_to_stack(sd, LAYERS))
    stack = GPT2Stack(LAYERS, DIM, HEADS)

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((2, 10, DIM)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(inputs_embeds=torch.from_numpy(emb),
                       position_ids=torch.zeros(1, 10, dtype=torch.long),
                       ).last_hidden_state.numpy()
    # zero wpe contribution: HF adds wpe[position_ids]; position_ids=0 row
    wpe0 = hf_model.wpe.weight[0].detach().numpy()
    ref_clean_emb = emb + wpe0  # what HF actually fed its blocks

    _, ours = stack.apply({"params": params}, jnp.asarray(ref_clean_emb))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_decode_matches_full_forward(hf_model):
    """Converted weights: incremental decode == full causal forward."""
    sd = hf_model.state_dict()
    params = to_jax(hf_gpt2_to_stack(sd, LAYERS))
    stack = GPT2Stack(LAYERS, DIM, HEADS)

    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((1, 6, DIM)).astype(np.float32))

    _, full = stack.apply({"params": params}, emb)

    cache = KVCache.zeros(LAYERS, 1, 8, HEADS, DIM // HEADS, dtype=jnp.float32)
    _, _, cache = stack.apply({"params": params}, emb[:, :3], cache,
                              method=stack.prefill)
    outs = []
    for i in range(3, 6):
        normed, cache = stack.apply({"params": params}, emb[:, i:i + 1],
                                    cache, i, method=stack.decode_step)
        outs.append(normed)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full[:, 3:6]),
                               rtol=2e-4, atol=2e-5)


def test_linear_and_conv_layouts():
    from xtts_tpu.utils.convert import conv1d_torch, linear
    sd = {"fc.weight": torch.randn(8, 4), "fc.bias": torch.randn(8),
          "cv.weight": torch.randn(6, 3, 5), "cv.bias": torch.randn(6)}
    l = linear(sd, "fc")
    assert l["kernel"].shape == (4, 8) and l["bias"].shape == (8,)
    c = conv1d_torch(sd, "cv")
    assert c["kernel"].shape == (5, 3, 6)


def test_torch_conv_parity():
    """flax Conv with converted kernel == torch Conv1d output."""
    from flax import linen as nn
    tconv = torch.nn.Conv1d(3, 6, 5, padding=2)
    sd = {"cv.weight": tconv.weight, "cv.bias": tconv.bias}
    from xtts_tpu.utils.convert import conv1d_torch, to_jax
    p = to_jax(conv1d_torch(sd, "cv"))
    x = np.random.default_rng(0).standard_normal((2, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    fconv = nn.Conv(6, (5,), padding="SAME")
    ours = fconv.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref,
                               rtol=1e-4, atol=1e-5)
