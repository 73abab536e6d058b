"""Torch -> JAX weight conversion for reference checkpoints.

The public reference checkpoints (README.md:10) are torch state dicts; this
module maps them onto the xtts_tpu param trees (SURVEY.md §7 "weight
conversion" hard part). Key facts:

* HF GPT2 Conv1D stores weight as (in, out) — the SAME layout as a flax
  Dense kernel, so attention/MLP weights transfer without transpose
  (ttts/gpt/model.py:246-266 builds a stock GPT2Model).
* torch nn.Linear stores (out, in) — needs a transpose to flax (in, out).
* torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out).
* torch LayerNorm weight/bias -> flax scale/bias.

`hf_gpt2_to_stack` is unit-tested against transformers' torch GPT2Model for
logit parity (tests/test_convert.py); the UnifiedVoice-level mapping uses the
reference state-dict names from ttts/gpt/model.py:294-362.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> numpy float32."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense {kernel, bias}."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1d_hf(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """HF transformers Conv1D (already (in, out)) -> flax Dense."""
    out = {"kernel": _np(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv1d_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Conv1d (out, in, k) -> flax Conv (k, in, out)."""
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layer_norm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def embedding(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[f"{prefix}.weight"])}


# ---------------------------------------------------------------------------
# GPT2 stack (HF GPT2Model state dict -> xtts_tpu.nn.transformer.GPT2Stack)
# ---------------------------------------------------------------------------

def hf_gpt2_to_stack(sd: Mapping[str, Any], layers: int,
                     prefix: str = "") -> Dict[str, Any]:
    """Map `transformer.h.*` weights onto GPT2Stack's param tree.

    sd keys: f"{prefix}h.{i}.ln_1.weight" etc. (strip any "transformer."
    by passing prefix).
    """
    params: Dict[str, Any] = {}
    for i in range(layers):
        p = f"{prefix}h.{i}."
        params[f"h_{i}"] = {
            "ln_1": layer_norm(sd, p + "ln_1"),
            "attn": {
                "c_attn": conv1d_hf(sd, p + "attn.c_attn"),
                "c_proj": conv1d_hf(sd, p + "attn.c_proj"),
            },
            "ln_2": layer_norm(sd, p + "ln_2"),
            "mlp": {
                "c_fc": conv1d_hf(sd, p + "mlp.c_fc"),
                "c_proj": conv1d_hf(sd, p + "mlp.c_proj"),
            },
        }
    params["ln_f"] = layer_norm(sd, prefix + "ln_f")
    return params


# ---------------------------------------------------------------------------
# UnifiedVoice (reference ttts/gpt/model.py state dict -> models.gpt)
# ---------------------------------------------------------------------------

def perceiver_from_reference(sd: Mapping[str, Any], prefix: str = "perceiver_encoder.",
                             depth: int = 2) -> Dict[str, Any]:
    """Reference PerceiverResampler (ttts/gpt/perceiver.py:225-276) ->
    xtts_tpu.nn.blocks.PerceiverResampler params.

    Reference layout per depth level i: `layers.{i}.0` = Attention
    (to_q/to_kv/to_out, bias-free), `layers.{i}.1` = Sequential(Linear,
    GEGLU, Linear) so the Linears sit at indices 0 and 2 (perceiver.py:222).
    """
    out: Dict[str, Any] = {"latents": _np(sd[prefix + "latents"]),
                           "norm": {"gamma": _np(sd[prefix + "norm.gamma"])}}
    if prefix + "proj_context.weight" in sd:
        out["proj_context"] = linear(sd, prefix + "proj_context")
    for i in range(depth):
        p = f"{prefix}layers.{i}."
        out[f"attn_{i}"] = {
            "to_q": linear(sd, p + "0.to_q"),
            "to_kv": linear(sd, p + "0.to_kv"),
            "to_out": linear(sd, p + "0.to_out"),
        }
        out[f"ff_{i}"] = {
            "Dense_0": linear(sd, p + "1.0"),
            "Dense_1": linear(sd, p + "1.2"),
        }
    return out


def unified_voice_from_reference(sd: Mapping[str, Any], layers: int,
                                 cond_attn_blocks: int = 6,
                                 use_perceiver: bool = False,
                                 perceiver_depth: int = 2) -> Dict[str, Any]:
    """Reference UnifiedVoice state dict -> xtts_tpu UnifiedVoice params.

    Name map (reference module attrs, ttts/gpt/model.py:294-362):
      text_embedding / mel_embedding        nn.Embedding
      text_pos_embedding.emb / mel_pos_...  LearnedPositionEmbeddings(:268-280)
      gpt.h.* / gpt.ln_f                    HF GPT2Model
      final_norm                            nn.LayerNorm
      text_head / mel_head                  nn.Linear
      conditioning_encoder.init             nn.Conv1d mel->dim (:210-213)
      conditioning_encoder.attn.{i}         AttentionBlock (utils.py:270-313)
      perceiver_encoder.*                   PerceiverResampler (:334-336)
    """
    params: Dict[str, Any] = {
        "text_embedding": embedding(sd, "text_embedding"),
        "mel_embedding": embedding(sd, "mel_embedding"),
        "text_pos_embedding": embedding(sd, "text_pos_embedding.emb"),
        "mel_pos_embedding": embedding(sd, "mel_pos_embedding.emb"),
        "gpt": hf_gpt2_to_stack(sd, layers, prefix="gpt."),
        "final_norm": layer_norm(sd, "final_norm"),
        "text_head": linear(sd, "text_head"),
        "mel_head": linear(sd, "mel_head"),
    }
    if use_perceiver:
        params["perceiver_encoder"] = perceiver_from_reference(
            sd, depth=perceiver_depth)
        return params
    ce: Dict[str, Any] = {"init": conv1d_torch(sd, "conditioning_encoder.init")}
    for i in range(cond_attn_blocks):
        p = f"conditioning_encoder.attn.{i}."
        blk = {
            # reference AttentionBlock qkv/proj_out are nn.Conv1d with k=1
            "qkv": _squeeze_conv1x1(sd, p + "qkv"),
            "proj_out": _squeeze_conv1x1(sd, p + "proj_out"),
            "GroupNorm32_0": {"GroupNorm_0": {
                "scale": _np(sd[p + "norm.weight"]),
                "bias": _np(sd[p + "norm.bias"])}},
        }
        ce[f"attn_{i}"] = blk
    params["conditioning_encoder"] = ce
    return params


def _squeeze_conv1x1(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv1d k=1 (out, in, 1) -> flax Dense (in, out)."""
    w = _np(sd[f"{prefix}.weight"])[:, :, 0].T
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


# ---------------------------------------------------------------------------
# Vocos (pretrained charactr/vocos-mel-24khz state dict -> models.vocos)
# ---------------------------------------------------------------------------

def vocos_from_pretrained(sd: Mapping[str, Any],
                          num_layers: int = 8) -> Dict[str, Any]:
    """Vocos torch state dict -> xtts_tpu Vocos params.

    Reference param names (ttts/vocoder/models.py:26-88 VocosBackbone,
    heads.py ISTFTHead): backbone.embed (Conv1d), backbone.norm (LayerNorm),
    backbone.convnext.{i}.{dwconv,norm,pwconv1,pwconv2,gamma},
    backbone.final_layer_norm, head.out (Linear).
    Depthwise conv: torch (C, 1, k) -> flax feature-grouped (k, 1, C).
    """
    params: Dict[str, Any] = {"backbone": {}, "head": {}}
    bb = params["backbone"]
    bb["embed"] = conv1d_torch(sd, "backbone.embed")
    bb["norm"] = layer_norm(sd, "backbone.norm")
    for i in range(num_layers):
        p = f"backbone.convnext.{i}."
        dw = _np(sd[p + "dwconv.weight"])          # (C, 1, k)
        blk = {
            "dwconv": {"kernel": np.transpose(dw, (2, 1, 0)),
                       "bias": _np(sd[p + "dwconv.bias"])},
            "LayerNorm_0": layer_norm(sd, p + "norm"),
            "pwconv1": linear(sd, p + "pwconv1"),
            "pwconv2": linear(sd, p + "pwconv2"),
            "gamma": _np(sd[p + "gamma"]),
        }
        bb[f"convnext_{i}"] = blk
    bb["final_layer_norm"] = layer_norm(sd, "backbone.final_layer_norm")
    params["head"] = {"out": linear(sd, "head.out")}
    return params


# ---------------------------------------------------------------------------
# DVAE (reference ttts/vqvae/xtts_dvae.py state dict -> models.dvae)
# ---------------------------------------------------------------------------

def dvae_codebook_from_reference(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Extract the EMA codebook buffers (Quantize registers embed /
    cluster_size / embed_avg, xtts_dvae.py:67-70) as the 'codebook'
    collection. The reference attr is `self.codebook = Quantize(...)`
    (xtts_dvae.py:296), so keys are codebook.*."""
    return {
        "embed": _np(sd["codebook.embed"]),
        "cluster_size": _np(sd["codebook.cluster_size"]),
        "embed_avg": _np(sd["codebook.embed_avg"]),
    }


def dvae_from_reference(sd: Mapping[str, Any], num_layers: int = 2,
                        num_resnet_blocks: int = 3) -> Dict[str, Any]:
    """Full reference DiscreteVAE state dict -> xtts_tpu DVAE variables.

    Sequential index map for the live config (num_layers=2, 3 resblocks,
    use_transposed_convs=False; builders xtts_dvae.py:253-293):

      encoder.{i}.0        strided conv i            -> encoder.Conv_{i}
      encoder.{L+j}.net.*  ResBlock j (convs 0,2,4)  -> encoder.res{j}.Conv_*
      encoder.{L+R}        conv1x1 -> codebook_dim   -> encoder.to_codes
      decoder.0            conv1x1 codebook -> inner -> decoder.from_codes
      decoder.{1+j}.net.*  ResBlock                  -> decoder.res{j}.Conv_*
      decoder.{1+R+i}.0.conv  UpsampledConv i        -> decoder.up{i}
      decoder.{1+R+L}      conv1x1 -> mel            -> decoder.to_mel
      codebook.*           Quantize EMA buffers      -> 'codebook' collection

    Returns a full variables dict {"params", "codebook"}.
    """
    L, R = num_layers, num_resnet_blocks

    def resblock(prefix: str) -> Dict[str, Any]:
        return {f"Conv_{j}": conv1d_torch(sd, f"{prefix}.net.{2 * j}")
                for j in range(3)}

    enc: Dict[str, Any] = {}
    for i in range(L):
        enc[f"Conv_{i}"] = conv1d_torch(sd, f"encoder.{i}.0")
    for j in range(R):
        enc[f"res{j}"] = resblock(f"encoder.{L + j}")
    enc["to_codes"] = conv1d_torch(sd, f"encoder.{L + R}")

    dec: Dict[str, Any] = {"from_codes": conv1d_torch(sd, "decoder.0")}
    for j in range(R):
        dec[f"res{j}"] = resblock(f"decoder.{1 + j}")
    for i in range(L):
        dec[f"up{i}"] = conv1d_torch(sd, f"decoder.{1 + R + i}.0.conv")
    dec["to_mel"] = conv1d_torch(sd, f"decoder.{1 + R + L}")

    return {
        "params": {"encoder": enc, "decoder": dec},
        "codebook": dvae_codebook_from_reference(sd),
    }


# ---------------------------------------------------------------------------
# AA_diffusion (reference ttts/diffusion/aa_model.py -> models.aa_diffusion)
# ---------------------------------------------------------------------------

def mha_to_flax(sd: Mapping[str, Any], prefix: str, heads: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

    in_proj_weight is (3E, E) packed [q; k; v]; flax wants per-projection
    kernels (E, heads, head_dim) and out kernel (heads, head_dim, E)."""
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    e = w.shape[1]
    hd = e // heads
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def proj(wm, bm):
        return {"kernel": wm.T.reshape(e, heads, hd),
                "bias": bm.reshape(heads, hd)}

    ow = _np(sd[f"{prefix}.out_proj.weight"])   # (E, E)
    return {
        "query": proj(qw, qb), "key": proj(kw, kb), "value": proj(vw, vb),
        "out": {"kernel": ow.T.reshape(heads, hd, e),
                "bias": _np(sd[f"{prefix}.out_proj.bias"])},
    }


def clip_from_reference(sd: Mapping[str, Any], layers: int, heads: int,
                        prefix: str = "refer_enc.visual.") -> Dict[str, Any]:
    """Reference CLIP vision tower (cldm/transformer.py:328-567
    VisionTransformer; live config ttts/diffusion/config.yaml "clip") ->
    CLIPRefEncoder params. The dead `proj` parameter (forward early-returns
    at transformer.py:520) is intentionally dropped."""
    p = prefix
    out: Dict[str, Any] = {
        "conv1": {"kernel": np.transpose(_np(sd[p + "conv1.weight"]), (2, 1, 0))},
        "class_embedding": _np(sd[p + "class_embedding"]),
        "positional_embedding": _np(sd[p + "positional_embedding"]),
        "ln_pre": layer_norm(sd, p + "ln_pre"),
        "ln_post": layer_norm(sd, p + "ln_post"),
    }
    for i in range(layers):
        rp = f"{p}transformer.resblocks.{i}."
        out[f"ln1_{i}"] = layer_norm(sd, rp + "ln_1")
        out[f"attn_{i}"] = mha_to_flax(sd, rp + "attn", heads)
        out[f"ln2_{i}"] = layer_norm(sd, rp + "ln_2")
        out[f"mlp_fc_{i}"] = linear(sd, rp + "mlp.c_fc")
        out[f"mlp_proj_{i}"] = linear(sd, rp + "mlp.c_proj")
    return out


def _openai_resblock(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """openaimodel.py ResBlock (in_layers norm/conv, emb_layers linear,
    out_layers norm/zero-conv) -> UNetResBlock params."""
    return {
        "GroupNorm32_0": {"GroupNorm_0": layer_norm(sd, prefix + "in_layers.0")},
        "in_conv": conv1d_torch(sd, prefix + "in_layers.2"),
        "emb_proj": linear(sd, prefix + "emb_layers.1"),
        "GroupNorm32_1": {"GroupNorm_0": layer_norm(sd, prefix + "out_layers.0")},
        "out_conv": conv1d_torch(sd, prefix + "out_layers.3"),
    }


def _spatial_transformer(sd: Mapping[str, Any], prefix: str,
                         depth: int = 1) -> Dict[str, Any]:
    """ldm attention.py SpatialTransformer (use_linear=False: 1x1 conv
    projections) -> SpatialTransformer1D params."""
    out: Dict[str, Any] = {
        "norm": {"GroupNorm_0": layer_norm(sd, prefix + "norm")},
        "proj_in": _squeeze_conv1x1(sd, prefix + "proj_in"),
        "proj_out": _squeeze_conv1x1(sd, prefix + "proj_out"),
    }
    for d in range(depth):
        bp = f"{prefix}transformer_blocks.{d}."

        def xattn(ap):
            return {
                "to_q": linear(sd, ap + "to_q"),
                "to_k": linear(sd, ap + "to_k"),
                "to_v": linear(sd, ap + "to_v"),
                "to_out": linear(sd, ap + "to_out.0"),
            }

        out[f"block_{d}"] = {
            "norm1": layer_norm(sd, bp + "norm1"),
            "norm2": layer_norm(sd, bp + "norm2"),
            "norm3": layer_norm(sd, bp + "norm3"),
            "attn1": xattn(bp + "attn1."),
            "attn2": xattn(bp + "attn2."),
            "ff": {"proj_in": linear(sd, bp + "ff.net.0.proj"),
                   "proj_out": linear(sd, bp + "ff.net.2")},
        }
    return out


def unet_trunk_from_reference(sd: Mapping[str, Any], prefix: str,
                              channel_mult, num_res_blocks: int,
                              transformer_depth: int = 1) -> Dict[str, Any]:
    """BaseModel/ReferenceNet trunk (aa_model.py:152-227). blocks layout per
    level: num_res_blocks x [ResBlock, SpatialTransformer] + closing ResBlock
    (no actual down/upsampling; `ds *= 2` commented out at :225)."""
    out: Dict[str, Any] = {
        "in_conv": conv1d_torch(sd, prefix + "blocks.0.0"),
        "time_fc1": linear(sd, prefix + "time_embed.0"),
        "time_fc2": linear(sd, prefix + "time_embed.2"),
    }
    blk = 1      # reference blocks index (0 was the initial conv)
    ri = 0       # our flat res_blocks index
    ai = 0       # our flat attn_blocks index
    for _level in channel_mult:
        for _ in range(num_res_blocks):
            out[f"res_blocks_{ri}"] = _openai_resblock(sd, f"{prefix}blocks.{blk}.0.")
            out[f"attn_blocks_{ai}"] = _spatial_transformer(
                sd, f"{prefix}blocks.{blk}.1.", transformer_depth)
            ri += 1
            ai += 1
            blk += 1
        out[f"res_blocks_{ri}"] = _openai_resblock(sd, f"{prefix}blocks.{blk}.0.")
        ri += 1
        blk += 1
    return out


def aa_diffusion_from_reference(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Full AA_diffusion state dict -> AADiffusion params.

    cfg: DiffusionModelConfig. Reference module attrs (aa_model.py:307-318):
    refer_enc (CLIP), refer_model (ReferenceNet), base_model (BaseModel),
    unconditioned_cat_embedding (1, 1024, 1). The ReferenceNet's unused
    `out` head and both models' duplicate hint_converter are resolved to:
    base_model.hint_converter -> our single top-level hint_converter."""
    clip_heads = cfg.clip.width // cfg.clip.head_width
    params: Dict[str, Any] = {
        "refer_enc": clip_from_reference(sd, cfg.clip.layers, clip_heads),
        "refer_model": unet_trunk_from_reference(
            sd, "refer_model.", cfg.channel_mult, cfg.num_res_blocks,
            cfg.transformer_depth),
        "base_model": unet_trunk_from_reference(
            sd, "base_model.", cfg.channel_mult, cfg.num_res_blocks,
            cfg.transformer_depth),
        "hint_converter": conv1d_torch(sd, "base_model.hint_converter"),
        "out_norm": {"GroupNorm_0": layer_norm(sd, "base_model.out.0")},
        "out_conv": conv1d_torch(sd, "base_model.out.2"),
        "unconditioned_cat_embedding": np.transpose(
            _np(sd["unconditioned_cat_embedding"]), (0, 2, 1)),
    }
    return params


# ---------------------------------------------------------------------------
# CLVP (reference ttts/clvp/model.py, live use_xformers=False tower)
# ---------------------------------------------------------------------------

def clvp_from_reference(sd: Mapping[str, Any], text_depth: int = 20,
                        speech_depth: int = 20) -> Dict[str, Any]:
    """Reference CLVP state dict -> xtts_tpu CLVP params (live tower:
    tortoise Transformer, ttts/utils/transformer.py:182-223).

    Reference layer path: {tower}.layers.layers.{i}.{0|1} where 0 =
    LayerScale(PreNorm(Attention)), 1 = LayerScale(PreNorm(FeedForward));
    scale is (1, 1, dim) -> squeezed to (dim,)."""

    def tower(prefix: str, depth: int) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for i in range(depth):
            lp = f"{prefix}.layers.layers.{i}."
            out[f"layer_{i}"] = {
                "scale_attn": _np(sd[lp + "0.scale"])[0, 0],
                "norm_attn": layer_norm(sd, lp + "0.fn.norm"),
                "attn": {
                    "to_qkv": linear(sd, lp + "0.fn.fn.to_qkv"),
                    "to_out": linear(sd, lp + "0.fn.fn.to_out.0"),
                },
                "scale_ff": _np(sd[lp + "1.scale"])[0, 0],
                "norm_ff": layer_norm(sd, lp + "1.fn.norm"),
                "ff_in": linear(sd, lp + "1.fn.fn.net.0"),
                "ff_out": linear(sd, lp + "1.fn.fn.net.3"),
            }
        return out

    return {
        "text_emb": embedding(sd, "text_emb"),
        "speech_emb": embedding(sd, "speech_emb"),
        "text_pos_emb": embedding(sd, "text_pos_emb"),
        "speech_pos_emb": embedding(sd, "speech_pos_emb"),
        "text_transformer": tower("text_transformer", text_depth),
        "speech_transformer": tower("speech_transformer", speech_depth),
        "to_text_latent": linear(sd, "to_text_latent"),
        "to_speech_latent": linear(sd, "to_speech_latent"),
        "temperature": _np(sd["temperature"]).reshape(1),
    }


# ---------------------------------------------------------------------------
# HiFi-GAN (reference ttts/hifigan/hifigan_vocoder.py -> models.hifigan)
# ---------------------------------------------------------------------------

def _wn_weight(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Materialize a torch weight_norm'd weight: w = g * v / ||v|| with the
    norm over all dims except 0 (weight_norm default dim=0). Falls back to a
    plain `weight` key (post remove_weight_norm checkpoints)."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    # torch >= 2.1 parametrize-style keys
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    return g * v / np.sqrt((v ** 2).sum(axis=axes, keepdims=True))


def _conv1d_wn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_wn_weight(sd, prefix), (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _convtranspose1d_wn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose1d (in, out, k) -> flax ConvTranspose
    (padding='SAME') kernel (k, in, out) FLIPPED along k — empirically exact
    for the k=2*stride, padding=(k-stride)//2 geometry HiFi-GAN uses."""
    w = _wn_weight(sd, prefix)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn_affine(sd: Mapping[str, Any], prefix: str,
               eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Fold eval-mode BatchNorm running stats into a per-channel affine
    (the _ChannelNorm mode='affine' layout)."""
    w = _np(sd[f"{prefix}.weight"])
    b = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "shift": b - mean * scale}


def _conv2d_swapped(sd: Mapping[str, Any], prefix: str,
                    weight_key: str = "weight") -> Dict[str, np.ndarray]:
    """torch Conv2d (out, in, kF, kT) on (B, 1, F, T) images -> flax Conv
    (kT, kF, in, out) on our (B, T, F, C) layout (spatial axes swapped)."""
    w = _np(sd[f"{prefix}.{weight_key}"])
    out = {"kernel": np.transpose(w, (3, 2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def hifigan_generator_from_reference(
        sd: Mapping[str, Any], prefix: str = "",
        n_up: int = 4, n_kernels: int = 3,
        resblock_type: str = "1", n_dilations: int = 3,
        cond: bool = True, cond_in_each: bool = True) -> Dict[str, Any]:
    """HifiganGenerator state dict (hifigan_vocoder.py:223-305) ->
    models.hifigan.HifiganGenerator params."""
    p = prefix
    out: Dict[str, Any] = {
        "conv_pre": _conv1d_wn(sd, p + "conv_pre"),
        "conv_post": _conv1d_wn(sd, p + "conv_post"),
    }
    if cond:
        out["cond_layer"] = _squeeze_conv1x1(sd, p + "cond_layer")
    for i in range(n_up):
        out[f"up_{i}"] = _convtranspose1d_wn(sd, f"{p}ups.{i}")
        if cond and cond_in_each:
            out[f"cond_up_{i}"] = _squeeze_conv1x1(sd, f"{p}conds.{i}")
        for j in range(n_kernels):
            rp = f"{p}resblocks.{i * n_kernels + j}."
            blk: Dict[str, Any] = {}
            for m in range(n_dilations):
                if resblock_type == "1":
                    blk[f"c1_{m}"] = _conv1d_wn(sd, f"{rp}convs1.{m}")
                    blk[f"c2_{m}"] = _conv1d_wn(sd, f"{rp}convs2.{m}")
                else:
                    blk[f"c_{m}"] = _conv1d_wn(sd, f"{rp}convs.{m}")
            out[f"res_{i}_{j}"] = blk
    return out


def speaker_encoder_from_reference(
        sd: Mapping[str, Any], prefix: str = "",
        layers=(3, 4, 6, 3)) -> Dict[str, Any]:
    """ResNetSpeakerEncoder (hifigan_vocoder.py:461-654) ->
    models.hifigan.ResNetSpeakerEncoder params (norm_mode='affine'):
    BatchNorms fold to affines; Conv2d spatial axes swap (we run (B,T,F,C),
    the reference (B,C,F,T)); feature flattening is channel-major on both
    sides so the ASP/fc weights transfer directly."""
    p = prefix
    out: Dict[str, Any] = {
        "stem": _conv2d_swapped(sd, p + "conv1"),
        "stem_norm": _bn_affine(sd, p + "bn1"),
        "asp_fc": _squeeze_conv1x1(sd, p + "attention.0"),
        "asp_norm": _bn_affine(sd, p + "attention.2"),
        "asp_att": _squeeze_conv1x1(sd, p + "attention.3"),
        "proj": linear(sd, p + "fc"),
    }
    for si, n in enumerate(layers):
        for bi in range(n):
            bp = f"{p}layer{si + 1}.{bi}."
            blk: Dict[str, Any] = {
                "conv1": _conv2d_swapped(sd, bp + "conv1"),
                "norm1": _bn_affine(sd, bp + "bn1"),
                "conv2": _conv2d_swapped(sd, bp + "conv2"),
                "norm2": _bn_affine(sd, bp + "bn2"),
                "se": {"fc1": linear(sd, bp + "se.fc.0"),
                       "fc2": linear(sd, bp + "se.fc.2")},
            }
            if f"{bp}downsample.0.weight" in sd:
                blk["short"] = _conv2d_swapped(sd, bp + "downsample.0")
                blk["short_norm"] = _bn_affine(sd, bp + "downsample.1")
            out[f"stage{si}_block{bi}"] = blk
    return out


def hifigan_from_reference(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Full HifiDecoder state dict (waveform_decoder + speaker_encoder,
    hifigan_vocoder.py:655-771) -> HifiDecoder params. Requires
    cfg.speaker_norm_mode == 'affine' on the target model."""
    return {
        "waveform_decoder": hifigan_generator_from_reference(
            sd, "waveform_decoder.",
            n_up=len(cfg.upsample_rates),
            n_kernels=len(cfg.resblock_kernel_sizes),
            resblock_type=cfg.resblock_type,
            n_dilations=len(cfg.resblock_dilation_sizes[0]),
            cond=True,
            cond_in_each=cfg.cond_d_vector_in_each_upsampling_layer),
        "speaker_encoder": speaker_encoder_from_reference(
            sd, "speaker_encoder."),
    }


# ---------------------------------------------------------------------------
# generic state-dict utilities
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Legacy DiffusionTts (ttts/diffusion/model.py:134-341 -> models.diffusion_tts)
# ---------------------------------------------------------------------------

def _attn_block_rel(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference AttentionBlock WITH relative_pos_embeddings
    (ttts/utils/utils.py:271-313) -> nn.blocks.AttentionBlock params."""
    return {
        "qkv": _squeeze_conv1x1(sd, prefix + ".qkv"),
        "proj_out": _squeeze_conv1x1(sd, prefix + ".proj_out"),
        "GroupNorm32_0": {"GroupNorm_0": {
            "scale": _np(sd[prefix + ".norm.weight"]),
            "bias": _np(sd[prefix + ".norm.bias"])}},
        "rel_pos": {"relative_attention_bias": {
            "embedding": _np(
                sd[prefix + ".relative_pos_embeddings"
                   ".relative_attention_bias.weight"])}},
    }


def _ts_resblock(sd: Mapping[str, Any], prefix: str,
                 has_skip: bool = False) -> Dict[str, Any]:
    """Reference guided-diffusion ResBlock (ttts/diffusion/model.py:60-121,
    efficient_config) -> models.diffusion_tts.TimestepResBlock params."""
    out = {
        "GroupNorm32_0": {"GroupNorm_0": {
            "scale": _np(sd[prefix + ".in_layers.0.weight"]),
            "bias": _np(sd[prefix + ".in_layers.0.bias"])}},
        "in_conv": conv1d_torch(sd, prefix + ".in_layers.2"),
        "emb_layers": linear(sd, prefix + ".emb_layers.1"),
        "out_norm": {"GroupNorm_0": {
            "scale": _np(sd[prefix + ".out_layers.0.weight"]),
            "bias": _np(sd[prefix + ".out_layers.0.bias"])}},
        "out_conv": conv1d_torch(sd, prefix + ".out_layers.3"),
    }
    if has_skip:
        out["skip"] = conv1d_torch(sd, prefix + ".skip_connection")
    return out


def _diffusion_layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"resblk": _ts_resblock(sd, prefix + ".resblk"),
            "attn": _attn_block_rel(sd, prefix + ".attn")}


def diffusion_tts_from_reference(sd: Mapping[str, Any],
                                 num_layers: int = 8) -> Dict[str, Any]:
    """Legacy DiffusionTts state dict -> models.diffusion_tts.DiffusionTts
    params (ctor attrs at ttts/diffusion/model.py:150-211)."""
    params: Dict[str, Any] = {
        "inp_block": conv1d_torch(sd, "inp_block"),
        "time_embed_0": linear(sd, "time_embed.0"),
        "time_embed_1": linear(sd, "time_embed.2"),
        "code_embedding": embedding(sd, "code_embedding"),
        "code_norm": {"GroupNorm_0": layer_norm(sd, "code_norm")},
        "latent_conditioner_conv": conv1d_torch(sd, "latent_conditioner.0"),
        "contextual_conv1": conv1d_torch(sd, "contextual_embedder.0"),
        "contextual_conv2": conv1d_torch(sd, "contextual_embedder.1"),
        "unconditioned_embedding": np.transpose(
            _np(sd["unconditioned_embedding"]), (0, 2, 1)),
        "integrating_conv": conv1d_torch(sd, "integrating_conv"),
        "mel_head": conv1d_torch(sd, "mel_head"),
        "out_norm": {"GroupNorm_0": layer_norm(sd, "out.0")},
        "out_conv": conv1d_torch(sd, "out.2"),
    }
    for i in range(3):
        params[f"code_converter_{i}"] = _attn_block_rel(
            sd, f"code_converter.{i}")
    for i in range(4):
        params[f"latent_conditioner_attn_{i}"] = _attn_block_rel(
            sd, f"latent_conditioner.{i + 1}")
    for i in range(5):
        params[f"contextual_attn_{i}"] = _attn_block_rel(
            sd, f"contextual_embedder.{i + 2}")
    for i in range(3):
        params[f"conditioning_timestep_integrator_{i}"] = _diffusion_layer(
            sd, f"conditioning_timestep_integrator.{i}")
    for i in range(num_layers):
        params[f"layers_{i}"] = _diffusion_layer(sd, f"layers.{i}")
    for j in range(3):
        params[f"final_res_{j}"] = _ts_resblock(sd,
                                                f"layers.{num_layers + j}")
    return params


# ---------------------------------------------------------------------------
# Audio classifier (ttts/classifier/model.py:81-151 -> models.classifier)
# ---------------------------------------------------------------------------

def _attn_block_plain(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference AttentionBlock WITHOUT relative position embeddings."""
    return {
        "qkv": _squeeze_conv1x1(sd, prefix + ".qkv"),
        "proj_out": _squeeze_conv1x1(sd, prefix + ".proj_out"),
        "GroupNorm32_0": {"GroupNorm_0": {
            "scale": _np(sd[prefix + ".norm.weight"]),
            "bias": _np(sd[prefix + ".norm.bias"])}},
    }


def classifier_from_reference(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """AudioMiniEncoderWithClassifierHead state dict -> AudioClassifier
    params. cfg: ClassifierConfig (shipped values ttts/classifier/config.json:
    depth 5, base 32, k5 resblocks, k5/stride-4 downsample convs)."""
    c = cfg.classifier if hasattr(cfg, "classifier") else cfg
    enc: Dict[str, Any] = {
        "init": conv1d_torch(sd, "enc.init.0"),
        "final_norm": {"GroupNorm_0": layer_norm(sd, "enc.final.0")},
        "final": conv1d_torch(sd, "enc.final.2"),
    }
    # enc.res is a flat nn.Sequential: per depth, resnet_blocks ResBlocks
    # then one Downsample (classifier/model.py:96-103)
    i = 0
    for d in range(c.depth):
        for r in range(c.resnet_blocks):
            p = f"enc.res.{i}"
            enc[f"res_{d}_{r}"] = {
                "GroupNorm32_0": {"GroupNorm_0": layer_norm(
                    sd, p + ".in_layers.0")},
                "in_conv": conv1d_torch(sd, p + ".in_layers.2"),
                "out_norm": {"GroupNorm_0": layer_norm(
                    sd, p + ".out_layers.0")},
                "out_conv": conv1d_torch(sd, p + ".out_layers.3"),
            }
            i += 1
        enc[f"down_{d}"] = conv1d_torch(sd, f"enc.res.{i}.op")
        i += 1
    for a in range(c.attn_blocks):
        enc[f"attn_{a}"] = _attn_block_plain(sd, f"enc.attn.{a}")
    return {"encoder": enc, "head": linear(sd, "head")}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference checkpoint; unwraps the {'model': ...} frame
    the trainers save (ttts/gpt/train_ms.py:131-140)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return sd


def to_jax(params: Dict[str, Any], dtype=None):
    import jax.numpy as jnp

    def cast(x):
        arr = jnp.asarray(x)
        return arr.astype(dtype) if dtype is not None else arr

    import jax
    return jax.tree_util.tree_map(cast, params)
