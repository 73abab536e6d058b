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

from xtts_tpu.core.config import VocosConfig
from xtts_tpu.dsp.spectral import istft

Dtype = Any


class ConvNeXtBlock(nn.Module):
    """Depthwise conv7 -> LN -> pw Dense(intermediate) -> GELU -> pw Dense
    -> layer-scale -> residual (ttts/vocoder/modules.py:8-61)."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        res = x
        x = nn.Conv(self.dim, (7,), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x).astype(res.dtype)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return res + gamma * x


class VocosBackbone(nn.Module):
    """Embed conv7 + LN + N ConvNeXt blocks + final LN
    (ttts/vocoder/models.py:26-88)."""

    cfg: VocosConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_btc):
        c = self.cfg
        x = nn.Conv(c.dim, (7,), padding=3, dtype=self.dtype, name="embed")(mel_btc)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        ls = 1.0 / c.num_layers
        for i in range(c.num_layers):
            x = ConvNeXtBlock(c.dim, c.intermediate_dim, ls, dtype=self.dtype,
                              name=f"convnext_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            name="final_layer_norm")(x).astype(x.dtype)


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


class Vocos(nn.Module):
    """decode: mel (B, n_mels, T) -> wav (B, samples)
    (facade semantics of ttts/vocoder/vocos.py:30-140)."""

    cfg: VocosConfig = VocosConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = VocosBackbone(self.cfg, dtype=self.dtype)
        self.head = ISTFTHead(self.cfg, dtype=self.dtype)

    def __call__(self, mel_bct: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(mel_bct, 1, 2)
        return self.head(self.backbone(x))

    decode = __call__
