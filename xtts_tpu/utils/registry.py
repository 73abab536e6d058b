"""Model loader registry — config + weights pairing.

Reference: `load_model('vqvae'|'gpt'|'diffusion'|'classifier')`
(ttts/utils/infer_utils.py:12-45) pairs a JSON config with a .pth checkpoint.
Here a name maps to (model class, config attr, init-shape builder); weights
load from an orbax/npz checkpoint or convert on the fly from a torch .pth via
xtts_tpu.utils.convert.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import XTTSConfig

MODELS: Dict[str, Dict[str, Any]] = {}


def register(name: str, build: Callable, init_args: Callable,
             convert: Optional[Callable] = None):
    MODELS[name] = {"build": build, "init_args": init_args, "convert": convert}


def _register_defaults():
    from xtts_tpu.models.aa_diffusion import AADiffusion
    from xtts_tpu.models.classifier import AudioClassifier
    from xtts_tpu.models.clvp import CLVP
    from xtts_tpu.models.dvae import DVAE
    from xtts_tpu.models.gpt import UnifiedVoice
    from xtts_tpu.models.hifigan import HifiDecoder
    from xtts_tpu.models.vocos import Vocos
    from xtts_tpu.utils import convert as cv

    register(
        "gpt",
        lambda cfg, dtype: UnifiedVoice(cfg.gpt, dtype=dtype),
        lambda cfg: (jnp.zeros((1, cfg.gpt.mel_bins, 64)),
                     jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
                     jnp.zeros((1, 16), jnp.int32), jnp.array([16 * 1024])),
        lambda sd, cfg: cv.unified_voice_from_reference(
            sd, cfg.gpt.layers, cfg.gpt.cond_attn_blocks),
    )
    register("vqvae",
             lambda cfg, dtype: DVAE(cfg.vqvae, dtype=dtype),
             lambda cfg: (jnp.zeros((1, cfg.vqvae.channels, 64)),),
             lambda sd, cfg: cv.dvae_from_reference(
                 sd, cfg.vqvae.num_layers, cfg.vqvae.num_resnet_blocks))
    register("diffusion",
             lambda cfg, dtype: AADiffusion(cfg.diffusion, dtype=dtype),
             lambda cfg: (jnp.zeros((1, cfg.diffusion.in_channels, 16)),
                          jnp.array([0]),
                          jnp.zeros((1, cfg.diffusion.in_latent_channels, 4)),
                          jnp.zeros((1, cfg.diffusion.in_channels, 16))),
             lambda sd, cfg: cv.aa_diffusion_from_reference(sd, cfg.diffusion))
    register("vocos",
             lambda cfg, dtype: Vocos(cfg.vocos, dtype=dtype),
             lambda cfg: (jnp.zeros((1, cfg.vocos.input_channels, 16)),),
             lambda sd, cfg: cv.vocos_from_pretrained(
                 sd, cfg.vocos.num_layers))
    register("clvp",
             lambda cfg, dtype: CLVP(cfg.clvp, dtype=dtype),
             lambda cfg: (jnp.zeros((1, 8), jnp.int32),
                          jnp.zeros((1, 8), jnp.int32)),
             lambda sd, cfg: cv.clvp_from_reference(
                 sd, cfg.clvp.text_enc_depth, cfg.clvp.speech_enc_depth))
    register("classifier",
             lambda cfg, dtype: AudioClassifier(cfg.classifier, dtype=dtype),
             lambda cfg: (jnp.zeros((1, 64, cfg.classifier.spec_dim)),),
             lambda sd, cfg: cv.classifier_from_reference(
                 sd, cfg.classifier))

    def _build_diffusion_tts(cfg, dtype):
        from xtts_tpu.models.diffusion_tts import DiffusionTts
        return DiffusionTts(dtype=dtype)

    # legacy tortoise denoiser (ttts/diffusion/model.py:134-341; built by
    # the reference api.py:200) — defaults match the reference ctor
    register("diffusion_tts",
             _build_diffusion_tts,
             lambda cfg: (jnp.zeros((1, 100, 16)), jnp.array([0]),
                          jnp.zeros((1, 512, 4)), jnp.zeros((1, 100, 16))),
             lambda sd, cfg: cv.diffusion_tts_from_reference(sd))
    register("hifigan",
             lambda cfg, dtype: HifiDecoder(cfg.hifigan, dtype=dtype),
             lambda cfg: (jnp.zeros((1, 8, cfg.hifigan.decoder_input_dim)),
                          jnp.zeros((1, cfg.hifigan.d_vector_dim))),
             lambda sd, cfg: cv.hifigan_from_reference(sd, cfg.hifigan))


_register_defaults()


def load_model(name: str, cfg: XTTSConfig = XTTSConfig(),
               weights_path: Optional[str] = None, dtype=jnp.float32,
               rng: Optional[jax.Array] = None) -> Tuple[Any, Any]:
    """Build `name` and return (model, variables).

    weights_path: None -> jitted random init; '*.npz' -> flat npz tree;
    '*.pth'/'*.pt' -> torch state dict converted via the registered mapper.
    """
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODELS)}")
    entry = MODELS[name]
    model = entry["build"](cfg, dtype)
    args = entry["init_args"](cfg)
    if weights_path is None:
        variables = jax.jit(model.init)(
            rng if rng is not None else jax.random.PRNGKey(0), *args)
        return model, variables

    if weights_path.endswith(".npz"):
        variables = unflatten_npz(np.load(weights_path))
        if "params" not in variables:   # params-only file
            variables = {"params": variables}
        return model, variables
    if weights_path.endswith((".pth", ".pt", ".bin")):
        if entry["convert"] is None:
            raise ValueError(f"no torch converter registered for {name!r}")
        from xtts_tpu.utils.convert import load_torch_checkpoint, to_jax
        sd = load_torch_checkpoint(weights_path)
        tree = to_jax(entry["convert"](sd, cfg), dtype)
        # converters return either bare params or a full variables dict
        # (e.g. DVAE ships a 'codebook' collection alongside 'params')
        variables = tree if "params" in tree else {"params": tree}
        return model, variables
    raise ValueError(f"unsupported weights format: {weights_path}")


def save_npz(path: str, params) -> None:
    """Flatten a variables tree to npz ('a/b/c' keys). Pass the FULL
    variables dict (incl. non-param collections like the DVAE codebook), not
    just variables['params'], or those collections are lost."""
    flat = {}

    def rec(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(v, f"{prefix}{k}/")
        else:
            flat[prefix.rstrip("/")] = np.asarray(tree)

    rec(params)
    np.savez(path, **flat)


def unflatten_npz(npz) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in npz.files:
        cur = out
        parts = key.split("/")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = npz[key]
    return out
