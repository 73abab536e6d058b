"""Vocos vocoder: ConvNeXt backbone + ISTFT head (TPU re-design of
ttts/vocoder/{models,heads,modules}.py).

mel (B, 100, T) -> waveform (B, (T-1)*hop) at 24 kHz. The backbone is all
convs/matmuls (MXU-friendly); the ISTFT head lowers to irfft + scatter-add
overlap-add (xtts_tpu/dsp/spectral.istft), matching the reference's custom
"same"-padded ISTFT (ttts/vocoder/spectral_ops.py:7-75).

Reference checkpoint equivalent: charactr/vocos-mel-24khz (test.py:76-77) —
dim 512, intermediate 1536, 8 ConvNeXt blocks, n_fft 1024 hop 256
(ttts/vocoder/config.yaml).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from xtts_tpu.core.config import VocosConfig
from xtts_tpu.dsp.spectral import imdct, istft

Dtype = Any


def symexp(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * (exp(|x|) - 1) (ttts/vocoder/modules.py:212-213)."""
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def _mel_perceptual_scale(sample_rate: int, out_dim: int) -> np.ndarray:
    """Per-output-bin 1 - f/f_max scale over an HTK mel grid — the
    IMDCTSymExpHead last-layer init (ttts/vocoder/heads.py:94-101, via
    torchaudio _hz_to_mel/_mel_to_hz HTK formulas)."""
    m_max = 2595.0 * np.log10(1.0 + (sample_rate // 2) / 700.0)
    m_pts = np.linspace(0.0, m_max, out_dim)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    return (1.0 - f_pts / f_pts.max()).astype(np.float32)


class AdaLayerNorm(nn.Module):
    """LayerNorm whose scale/shift come from per-class embeddings
    (ttts/vocoder/modules.py:63-87; init scale=1, shift=0). Used for the
    multi-bandwidth Encodec-conditioned Vocos variant."""

    num_embeddings: int
    dim: int

    @nn.compact
    def __call__(self, x, cond_id):  # x (B, T, C), cond_id () or (B,)
        scale = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.ones,
                         name="scale")(cond_id)
        shift = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.zeros,
                         name="shift")(cond_id)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=jnp.float32)(x)
        return x * scale + shift


class ConvNeXtBlock(nn.Module):
    """Depthwise conv7 -> LN -> pw Dense(intermediate) -> GELU -> pw Dense
    -> layer-scale -> residual (ttts/vocoder/modules.py:8-61). With
    `adanorm_num_embeddings` the LN is an AdaLayerNorm keyed by cond_id."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float
    adanorm_num_embeddings: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_id=None):  # (B, T, C)
        res = x
        x = nn.Conv(self.dim, (7,), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim,
                             name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x)
        x = x.astype(res.dtype)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return res + gamma * x


class VocosBackbone(nn.Module):
    """Embed conv7 + LN + N ConvNeXt blocks + final LN
    (ttts/vocoder/models.py:26-88). `adanorm_num_embeddings` enables the
    bandwidth-conditioned AdaLayerNorm path (Encodec variant)."""

    cfg: VocosConfig
    adanorm_num_embeddings: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_btc, cond_id=None):
        c = self.cfg
        x = nn.Conv(c.dim, (7,), padding=3, dtype=self.dtype, name="embed")(mel_btc)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, c.dim,
                             name="norm")(x, cond_id).astype(x.dtype)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="norm")(x).astype(x.dtype)
        ls = 1.0 / c.num_layers
        for i in range(c.num_layers):
            x = ConvNeXtBlock(c.dim, c.intermediate_dim, ls,
                              adanorm_num_embeddings=self.adanorm_num_embeddings,
                              dtype=self.dtype, name=f"convnext_{i}")(
                                  x, cond_id)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            name="final_layer_norm")(x).astype(x.dtype)


class VocosResBlock1(nn.Module):
    """HiFi-GAN-V1 dilated resblock without upsampling, with optional
    layer-scale gammas (ttts/vocoder/modules.py:89-186)."""

    dim: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)
    lrelu_slope: float = 0.1
    layer_scale_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, self.lrelu_slope)
            h = nn.Conv(self.dim, (self.kernel_size,), kernel_dilation=d,
                        padding="SAME", dtype=self.dtype,
                        name=f"convs1_{i}")(h)
            h = nn.leaky_relu(h, self.lrelu_slope)
            h = nn.Conv(self.dim, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"convs2_{i}")(h)
            if self.layer_scale_init:
                gamma = self.param(f"gamma_{i}",
                                   nn.initializers.constant(
                                       self.layer_scale_init), (self.dim,))
                h = gamma * h
            x = x + h
        return x


class VocosResNetBackbone(nn.Module):
    """Alternative ResBlock backbone (ttts/vocoder/models.py:100-127)."""

    cfg: VocosConfig
    num_blocks: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_btc, cond_id=None):
        c = self.cfg
        x = nn.Conv(c.dim, (3,), padding=1, dtype=self.dtype,
                    name="embed")(mel_btc)
        ls = 1.0 / self.num_blocks / 3
        for i in range(self.num_blocks):
            x = VocosResBlock1(c.dim, layer_scale_init=ls, dtype=self.dtype,
                               name=f"resnet_{i}")(x)
        return x


def encodec_features(codes: jnp.ndarray, codebook_weights: jnp.ndarray,
                     bins: int) -> jnp.ndarray:
    """Sum per-quantizer codebook embeddings in one vectorized gather
    (ttts/vocoder/feature_extractors.py:155-168): codes (num_q, B, T) int32
    + stacked weights (num_q*bins, D) -> features (B, D, T)."""
    num_q = codes.shape[0]
    offsets = (jnp.arange(num_q) * bins).reshape(-1, 1, 1)
    emb = codebook_weights[codes + offsets]          # (num_q, B, T, D)
    return jnp.swapaxes(emb.sum(axis=0), 1, 2)


class EncodecFeatures:
    """Encodec-token feature extractor for the multi-bandwidth Vocos variant
    (ttts/vocoder/feature_extractors.py:124-168).

    The Encodec encoder itself is an external pretrained model (the `encodec`
    package is not in this image, zero egress), so it is INJECTED as
    `encode_fn(audio (B, T), bandwidth) -> codes (num_q, B, frames) int32`,
    mirroring how ASR is injected in the data pipeline. The codebook
    summation runs as one jitted gather (encodec_features)."""

    def __init__(self, encode_fn, codebook_weights, bins: int = 1024,
                 bandwidths=(1.5, 3.0, 6.0, 12.0)):
        self.encode_fn = encode_fn
        self.codebook_weights = jnp.asarray(codebook_weights)
        self.bins = bins
        self.bandwidths = tuple(bandwidths)

    def __call__(self, audio: jnp.ndarray, bandwidth_id: int) -> jnp.ndarray:
        codes = self.encode_fn(audio, self.bandwidths[int(bandwidth_id)])
        return encodec_features(jnp.asarray(codes, jnp.int32),
                                self.codebook_weights, self.bins)


class ISTFTHead(nn.Module):
    """Dense -> (log-mag, phase) -> complex spec -> iSTFT
    (ttts/vocoder/heads.py:24-67)."""

    cfg: VocosConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H) -> (B, samples)
        c = self.cfg
        out = nn.Dense(c.n_fft + 2, dtype=self.dtype, name="out")(x)
        out = out.astype(jnp.float32)
        mag, phase = jnp.split(out, 2, axis=-1)       # (B, T, n_fft//2+1)
        mag = jnp.exp(mag)
        mag = jnp.clip(mag, max=1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        # (B, bins, T) for the iSTFT
        real = jnp.swapaxes(real, 1, 2)
        imag = jnp.swapaxes(imag, 1, 2)
        return istft(real, imag, c.n_fft, c.hop_length, padding=c.padding)


class IMDCTSymExpHead(nn.Module):
    """Dense -> symexp -> clip -> IMDCT (ttts/vocoder/heads.py:70-121).

    When cfg.head_sample_rate is set, the dense kernel init is scaled per
    output bin by a 1 - f/f_max mel-grid factor (perceptual init,
    heads.py:94-101). Divergence: the reference's `clip_audio` branch clips
    the pre-IMDCT COEFFICIENTS and returns them (heads.py:117-118 uses `x`,
    not `audio` — a bug, wrong tensor and wrong shape); we clip the audio,
    which is the documented intent. clip_audio defaults False in both."""

    cfg: VocosConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H) -> (B, samples)
        c = self.cfg
        out_dim = c.mdct_frame_len // 2
        kernel_init = nn.initializers.lecun_normal()
        if c.head_sample_rate is not None:
            scale = _mel_perceptual_scale(c.head_sample_rate, out_dim)
            base = kernel_init

            def kernel_init(key, shape, dtype=jnp.float32):
                return base(key, shape, dtype) * jnp.asarray(scale)[None, :]

        coeffs = nn.Dense(out_dim, dtype=self.dtype, name="out",
                          kernel_init=kernel_init)(x)
        coeffs = jnp.clip(symexp(coeffs.astype(jnp.float32)), -1e2, 1e2)
        audio = imdct(coeffs, c.mdct_frame_len, c.padding)
        if c.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


class IMDCTCosHead(nn.Module):
    """Dense -> exp(m)·cos(p) -> IMDCT (ttts/vocoder/heads.py:123-157).
    Same clip_audio divergence note as IMDCTSymExpHead."""

    cfg: VocosConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H) -> (B, samples)
        c = self.cfg
        out = nn.Dense(c.mdct_frame_len, dtype=self.dtype, name="out")(x)
        out = out.astype(jnp.float32)
        m, p = jnp.split(out, 2, axis=-1)
        m = jnp.clip(jnp.exp(m), max=1e2)
        audio = imdct(m * jnp.cos(p), c.mdct_frame_len, c.padding)
        if c.clip_audio:
            audio = jnp.clip(audio, -1.0, 1.0)
        return audio


_HEADS = {"istft": ISTFTHead, "imdct_symexp": IMDCTSymExpHead,
          "imdct_cos": IMDCTCosHead}


class Vocos(nn.Module):
    """decode: mel (B, n_mels, T) -> wav (B, samples)
    (facade semantics of ttts/vocoder/vocos.py:30-140)."""

    cfg: VocosConfig = VocosConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = VocosBackbone(self.cfg, dtype=self.dtype)
        if self.cfg.head not in _HEADS:
            raise ValueError(f"unknown Vocos head {self.cfg.head!r}; "
                             f"have {sorted(_HEADS)}")
        self.head = _HEADS[self.cfg.head](self.cfg, dtype=self.dtype)

    def __call__(self, mel_bct: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(mel_bct, 1, 2)
        return self.head(self.backbone(x))

    decode = __call__
