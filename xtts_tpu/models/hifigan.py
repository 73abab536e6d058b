"""HiFi-GAN latent decoder — GPT latents -> waveform, speaker-conditioned.

Reference: ttts/hifigan/hifigan_vocoder.py — HifiganGenerator (:58-377, MRF
resblocks + transposed-conv upsampling + optional per-layer speaker cond),
ResNetSpeakerEncoder (:461-654, SE-ResNet d-vector on 64-mel/16 kHz),
HifiDecoder (:655-771, latent 1024 -> 24 kHz wav with two linear interps).
This is the alternative "shortcut" vocoder path that skips diffusion+Vocos
(README.md:46-47, XTTS-v2 style).

TPU design notes:
* channels-last conv stacks (MXU-friendly); ConvTranspose for upsampling;
* torch weight_norm is omitted — it is a reparameterization trick that XLA
  gains nothing from; spectral behavior is covered by the GAN objective;
* the two fractional resamplings of HifiDecoder.forward (1024/256 then
  24000/22050) fold into one linear interpolation to the exact output length.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.core.config import HiFiGANConfig

Dtype = Any
LRELU_SLOPE = 0.1


def linear_resize_time(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """(B, T, C) -> (B, new_len, C) linear interpolation (align_corners=False
    torch semantics, matching F.interpolate mode='linear')."""
    b, t, c = x.shape
    scale = t / new_len
    pos = (jnp.arange(new_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (pos - lo)[None, :, None]
    return x[:, lo] * (1 - frac) + x[:, hi] * frac


class ResBlock1(nn.Module):
    """3x (lrelu -> dilated conv -> lrelu -> conv) with residuals
    (hifigan_vocoder.py:58-130)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding="SAME", dtype=self.dtype, name=f"c1_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"c2_{i}")(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """2x (lrelu -> dilated conv) with residuals (hifigan type-2)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding="SAME", dtype=self.dtype, name=f"c_{i}")(h)
            x = x + h
        return x


class HifiganGenerator(nn.Module):
    """conv_pre -> [upsample + MRF]* -> conv_post -> tanh
    (hifigan_vocoder.py:220-377). Input (B, T, in_channels)."""

    in_channels: int
    out_channels: int = 1
    resblock_type: str = "1"
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    cond_channels: int = 0
    cond_in_each_up_layer: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g: Optional[jnp.ndarray] = None):
        """x: (B, T, C_in); g: (B, cond_channels) global speaker embedding.
        Returns (B, T * prod(upsample_rates), out_channels)."""
        rb = ResBlock1 if self.resblock_type == "1" else ResBlock2
        o = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    dtype=self.dtype, name="conv_pre")(x)
        if g is not None:
            o = o + nn.Dense(self.upsample_initial_channel, dtype=self.dtype,
                             name="cond_layer")(g)[:, None, :]
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            o = nn.leaky_relu(o, LRELU_SLOPE)
            o = nn.ConvTranspose(ch, (k,), strides=(u,), padding="SAME",
                                 dtype=self.dtype, name=f"up_{i}")(o)
            if g is not None and self.cond_in_each_up_layer:
                o = o + nn.Dense(ch, dtype=self.dtype,
                                 name=f"cond_up_{i}")(g)[:, None, :]
            # MRF: average over kernel-size branches
            z = None
            for j, (ks, ds) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                r = rb(ch, ks, tuple(ds), dtype=self.dtype,
                       name=f"res_{i}_{j}")(o)
                z = r if z is None else z + r
            o = z / len(self.resblock_kernel_sizes)
        # the reference's final activation is F.leaky_relu with the DEFAULT
        # 0.01 slope, not LRELU_SLOPE (hifigan_vocoder.py:336)
        o = nn.leaky_relu(o, 0.01)
        o = nn.Conv(self.out_channels, (7,), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_post")(o)
        return jnp.tanh(o)


# ---------------------------------------------------------------------------
# Speaker encoder (d-vector)
# ---------------------------------------------------------------------------


class _ChannelNorm(nn.Module):
    """Pluggable norm for the speaker encoder.

    mode="layer": LayerNorm over channels — our training-friendly choice (no
    batch-stat collectives across a pjit mesh, batch-size-independent
    inference). mode="affine": per-channel scale/shift — exactly what the
    reference's eval-mode BatchNorm2d computes once its running stats are
    folded in, the target layout for converted reference checkpoints."""

    channels: int
    mode: str = "layer"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.mode == "layer":
            return nn.LayerNorm(dtype=self.dtype)(x)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        shift = self.param("shift", nn.initializers.zeros, (self.channels,))
        return x * scale + shift


class _SELayer(nn.Module):
    channels: int
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C) — squeeze-excite (hifigan_vocoder.py:378-393)
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(max(1, self.channels // self.reduction),
                             dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype,
                                name="fc2")(s))
        return x * s[:, None, None, :]


class _SEBasicBlock(nn.Module):
    """conv1 -> relu -> norm1 -> conv2 -> norm2 -> SE -> +residual -> relu,
    the exact op order of the reference SEBasicBlock
    (hifigan_vocoder.py:396-427); convs are biasless like the reference."""

    channels: int
    stride: int = 1
    norm_mode: str = "layer"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # explicit symmetric padding: flax "SAME" pads (0,1) at stride 2,
        # torch padding=1 pads (1,1) — different input positions
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(h)
        h = _ChannelNorm(self.channels, self.norm_mode, dtype=self.dtype,
                         name="norm1")(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = _ChannelNorm(self.channels, self.norm_mode, dtype=self.dtype,
                         name="norm2")(h)
        h = _SELayer(self.channels, dtype=self.dtype, name="se")(h)
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(self.channels, (1, 1), use_bias=False,
                        strides=(self.stride, self.stride),
                        dtype=self.dtype, name="short")(x)
            x = _ChannelNorm(self.channels, self.norm_mode, dtype=self.dtype,
                             name="short_norm")(x)
        return nn.relu(x + h)


def instance_norm_time(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm1d(no affine) over the time axis of (B, T, F) — the
    reference normalizes each mel channel per utterance
    (hifigan_vocoder.py:495,576)."""
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResNetSpeakerEncoder(nn.Module):
    """SE-ResNet34-style d-vector network over a 64-bin 16 kHz log-mel
    (hifigan_vocoder.py:461-654). Input (B, T, 64) LOG-mel (log(mel+1e-6)
    applied by the caller / speaker_encoder_features); instance-norm over
    time happens here like the reference (:576). Output l2-normed
    (B, proj_dim).

    norm_mode="layer" (default) trains without batch statistics;
    norm_mode="affine" is the converted-checkpoint layout (folded eval BN)."""

    proj_dim: int = 512
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    num_filters: Tuple[int, ...] = (32, 64, 128, 256)
    norm_mode: str = "layer"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = instance_norm_time(mel)[..., None]  # (B, T, F, 1)
        x = nn.Conv(self.num_filters[0], (3, 3), padding="SAME",
                    dtype=self.dtype, name="stem")(x)
        x = nn.relu(x)
        x = _ChannelNorm(self.num_filters[0], self.norm_mode,
                         dtype=self.dtype, name="stem_norm")(x)
        for si, (n, ch) in enumerate(zip(self.layers, self.num_filters)):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = _SEBasicBlock(ch, stride, self.norm_mode,
                                  dtype=self.dtype,
                                  name=f"stage{si}_block{bi}")(x)
        # collapse (C, F') into one vector per frame, channel-major like the
        # reference's (B, C, F, T) -> (B, C*F, T) reshape (:583)
        b, t, f, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * f)
        # attentive statistics pooling: conv1x1 -> relu -> norm -> conv1x1
        # -> softmax over time (:515-521, 586-592)
        w = nn.relu(nn.Dense(128, dtype=self.dtype, name="asp_fc")(x))
        w = _ChannelNorm(128, self.norm_mode, dtype=self.dtype,
                         name="asp_norm")(w)
        w = jax.nn.softmax(nn.Dense(x.shape[-1], dtype=self.dtype,
                                    name="asp_att")(w), axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x ** 2) * w, axis=1) - mu ** 2,
                               1e-5, None))
        h = jnp.concatenate([mu, sg], axis=-1)
        h = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj")(h)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# HifiDecoder facade
# ---------------------------------------------------------------------------


def hifigan_frames(cfg: "HiFiGANConfig", n_latents: int) -> int:
    """Latent count -> generator input frames: the reference's two
    interpolations (1024/256 then out_sr/in_sr, hifigan_vocoder.py:719-731)
    folded into one resize. Single source of truth for the length
    contract — the decoder and every waveform-trim site derive from it."""
    return int(round(n_latents * (cfg.ar_mel_length_compression
                                  / cfg.output_hop_length)
                     * (cfg.output_sample_rate / cfg.input_sample_rate)))


def hifigan_samples(cfg: "HiFiGANConfig", n_latents: int) -> int:
    """Latent count -> output waveform samples (frames x prod(upsample))."""
    up = 1
    for r in cfg.upsample_rates:
        up *= r
    return hifigan_frames(cfg, n_latents) * up


class HifiDecoder(nn.Module):
    """GPT latent (B, T_lat, 1024) + speaker d-vector -> (B, T_wav) waveform
    (hifigan_vocoder.py:655-771)."""

    cfg: HiFiGANConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.waveform_decoder = HifiganGenerator(
            in_channels=c.decoder_input_dim,
            out_channels=1,
            resblock_type=c.resblock_type,
            resblock_dilation_sizes=tuple(tuple(d) for d in
                                          c.resblock_dilation_sizes),
            resblock_kernel_sizes=tuple(c.resblock_kernel_sizes),
            upsample_kernel_sizes=tuple(c.upsample_kernel_sizes),
            upsample_initial_channel=c.upsample_initial_channel,
            upsample_rates=tuple(c.upsample_rates),
            cond_channels=c.d_vector_dim,
            cond_in_each_up_layer=c.cond_d_vector_in_each_upsampling_layer,
            dtype=self.dtype,
        )
        self.speaker_encoder = ResNetSpeakerEncoder(
            proj_dim=c.d_vector_dim, norm_mode=c.speaker_norm_mode,
            dtype=self.dtype)

    def __call__(self, latents: jnp.ndarray,
                 g: Optional[jnp.ndarray] = None,
                 ref_mel16k: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """latents: (B, T_lat, D); g: (B, d_vector_dim) speaker d-vector, or
        ref_mel16k: (B, T, 64) to derive it in-graph. Returns (B, T_wav).

        Initialize with `ref_mel16k` (not `g`) so BOTH submodules get params.

        The reference interpolates latents by 1024/256 then by 24000/22050
        (hifigan_vocoder.py:719-731); both fold into one resize to the final
        frame count before the generator's prod(upsample_rates)=256 blow-up.
        """
        if g is None:
            if ref_mel16k is None:
                raise ValueError("need speaker d-vector g or ref_mel16k")
            g = self.speaker_encoder(ref_mel16k)
        frames = hifigan_frames(self.cfg, latents.shape[1])
        z = linear_resize_time(latents, frames)
        wav = self.waveform_decoder(z, g=g)
        return wav[..., 0]

    def speaker_embedding(self, mel16k: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 64) 16 kHz log-mel -> (B, d_vector_dim)."""
        return self.speaker_encoder(mel16k)
