"""HiFi-GAN discriminators: multi-period (MPD) + multi-scale (MSD).

Reference: ttts/hifigan/hifigan_discriminator.py:9-216. MPD folds the
waveform into (T/p, p) frames per prime period and runs strided 2-D convs;
MSD runs grouped 1-D convs at x1/x2/x4 average-pooled scales. Both return
per-layer feature maps for the feature-matching loss.

TPU notes: channels-last; LeakyReLU 0.1; no weight/spectral norm (see
models/hifigan.py rationale); all periods/scales evaluated in one jitted call.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """One period discriminator: wav (B, T) -> logits + features."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t = x.shape
        pad = (-t) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1)  # (B, T/p, p, 1)
        feats: List[jnp.ndarray] = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding="SAME", dtype=self.dtype, name=f"c{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding="SAME",
                    dtype=self.dtype, name="c4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        x = nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype, name="post")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class DiscriminatorS(nn.Module):
    """One scale discriminator: grouped 1-D convs on (B, T)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = x[..., None]  # (B, T, 1)
        feats: List[jnp.ndarray] = []
        spec = [  # (ch, kernel, stride, groups)
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(spec):
            x = nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                        feature_group_count=g if x.shape[-1] % g == 0 else 1,
                        dtype=self.dtype, name=f"c{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype, name="post")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


def avg_pool_1d(x: jnp.ndarray, window: int = 4, stride: int = 2) -> jnp.ndarray:
    """(B, T) -> downsampled (B, T') mean pool with same-ish padding."""
    pad = (window - stride) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n = (x.shape[1] - window) // stride + 1
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(window)[None, :]
    return x[:, idx].mean(axis=-1)


class HifiganDiscriminator(nn.Module):
    """MPD (periods 2,3,5,7,11) + MSD (scales x1, x2, x4) ensemble."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    scales: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray
                 ) -> Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]:
        """wav: (B, T). Returns (score list, per-discriminator feature lists)."""
        scores, feats = [], []
        for p in self.periods:
            s, f = DiscriminatorP(p, dtype=self.dtype, name=f"mpd_{p}")(wav)
            scores.append(s)
            feats.append(f)
        x = wav
        for i in range(self.scales):
            if i > 0:
                x = avg_pool_1d(x)
            s, f = DiscriminatorS(dtype=self.dtype, name=f"msd_{i}")(x)
            scores.append(s)
            feats.append(f)
        return scores, feats
