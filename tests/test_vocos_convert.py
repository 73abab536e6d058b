"""Vocos pretrained-checkpoint converter: structural + functional check
against a synthetic torch state dict with the reference's parameter names
(ttts/vocoder/models.py VocosBackbone + heads.py ISTFTHead)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from xtts_tpu.core.config import VocosConfig
from xtts_tpu.models.vocos import Vocos
from xtts_tpu.utils.convert import to_jax, vocos_from_pretrained

CFG = VocosConfig(dim=8, intermediate_dim=16, num_layers=2, n_fft=64,
                  hop_length=16, input_channels=10)


def _synthetic_sd(g):
    sd = {
        "backbone.embed.weight": torch.randn(8, 10, 7, generator=g),
        "backbone.embed.bias": torch.randn(8, generator=g),
        "backbone.norm.weight": torch.randn(8, generator=g),
        "backbone.norm.bias": torch.randn(8, generator=g),
        "backbone.final_layer_norm.weight": torch.randn(8, generator=g),
        "backbone.final_layer_norm.bias": torch.randn(8, generator=g),
        "head.out.weight": torch.randn(66, 8, generator=g),
        "head.out.bias": torch.randn(66, generator=g),
    }
    for i in range(2):
        p = f"backbone.convnext.{i}."
        sd.update({
            p + "dwconv.weight": torch.randn(8, 1, 7, generator=g),
            p + "dwconv.bias": torch.randn(8, generator=g),
            p + "norm.weight": torch.randn(8, generator=g),
            p + "norm.bias": torch.randn(8, generator=g),
            p + "pwconv1.weight": torch.randn(16, 8, generator=g),
            p + "pwconv1.bias": torch.randn(16, generator=g),
            p + "pwconv2.weight": torch.randn(8, 16, generator=g),
            p + "pwconv2.bias": torch.randn(8, generator=g),
            p + "gamma": torch.randn(8, generator=g),
        })
    return sd


def test_structure_matches_model_init():
    g = torch.Generator().manual_seed(0)
    params = to_jax(vocos_from_pretrained(_synthetic_sd(g), num_layers=2))
    model = Vocos(CFG)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 8)))["params"]
    s1 = {jtu.keystr(k): x.shape for k, x in jtu.tree_leaves_with_path(init)}
    s2 = {jtu.keystr(k): x.shape for k, x in jtu.tree_leaves_with_path(params)}
    assert s1 == s2


def test_converted_weights_run():
    g = torch.Generator().manual_seed(1)
    params = to_jax(vocos_from_pretrained(_synthetic_sd(g), num_layers=2))
    model = Vocos(CFG)
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, 10, 8)).astype(np.float32))
    wav = model.apply({"params": params}, mel)
    assert wav.shape == (1, 8 * 16) and np.isfinite(np.asarray(wav)).all()


def test_registry_pth_path(tmp_path):
    """Full load_model('vocos', weights_path=*.pth) flow."""
    g = torch.Generator().manual_seed(2)
    sd = _synthetic_sd(g)
    p = str(tmp_path / "vocos.pth")
    torch.save(sd, p)
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.utils.registry import load_model
    model, variables = load_model("vocos", XTTSConfig(vocos=CFG),
                                  weights_path=p)
    wav = model.apply(variables, jnp.zeros((1, 10, 8)))
    assert wav.shape == (1, 128)
