"""Shared neural building blocks (flax.linen).

Internal layout convention is channels-last (B, T, C): TPU/XLA prefers the
feature axis minor so convs lower to MXU matmuls without transposes. The
reference's (B, C, T) torch layout only appears at API boundaries.

Blocks mirror the reference inventory (SURVEY.md §1 L1):
* GroupNorm with the tortoise group-count rule + f32 compute
  (ttts/utils/utils.py:212-232 GroupNorm32/normalization)
* AttentionBlock / QKVAttentionLegacy (ttts/utils/utils.py:235-313)
* timestep_embedding (ttts/diffusion/ldm/modules/diffusionmodules/util.py)
* PerceiverResampler (ttts/gpt/perceiver.py:225-276)
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def tortoise_group_count(channels: int) -> int:
    """Group-count rule of ttts/utils/utils.py:217-231."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


class GroupNorm32(nn.Module):
    """GroupNorm computed in f32 regardless of input dtype."""

    channels: int
    groups: Optional[int] = None
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.groups if self.groups is not None else tortoise_group_count(self.channels)
        orig = x.dtype
        x = nn.GroupNorm(num_groups=g, epsilon=self.eps, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return x.astype(orig)


def zeros_init():
    return nn.initializers.zeros


class RelativePositionBias(nn.Module):
    """T5-bucketed relative attention bias
    (ttts/utils/xtransformers.py:146-186): log-spaced distance buckets, a
    per-(bucket, head) learned table, added to the pre-softmax logits scaled
    by `scale`."""

    scale: float
    heads: int
    num_buckets: int = 32
    max_distance: int = 128
    causal: bool = False

    def _bucket(self, rel_pos):
        num_buckets = self.num_buckets
        ret = jnp.zeros_like(rel_pos)
        n = -rel_pos
        if not self.causal:
            num_buckets //= 2
            ret = ret + (n < 0).astype(jnp.int32) * num_buckets
            n = jnp.abs(n)
        else:
            n = jnp.maximum(n, 0)
        max_exact = num_buckets // 2
        val_if_large = max_exact + (
            jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
            / math.log(self.max_distance / max_exact)
            * (num_buckets - max_exact)).astype(jnp.int32)
        val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
        return ret + jnp.where(n < max_exact, n, val_if_large)

    @nn.compact
    def __call__(self, qk_dots):  # (B, H, T, S)
        t, s = qk_dots.shape[-2:]
        rel = jnp.arange(s)[None, :] - jnp.arange(t)[:, None]
        table = nn.Embed(self.num_buckets, self.heads,
                         name="relative_attention_bias")(self._bucket(rel))
        bias = jnp.transpose(table, (2, 0, 1))[None]       # (1, H, T, S)
        return qk_dots + bias * self.scale


class AttentionBlock(nn.Module):
    """Self-attention over the time axis with residual, zero-init output proj.

    Matches ttts/utils/utils.py:270-313 (norm -> 1x1 qkv -> legacy QKV
    attention with 1/sqrt(sqrt(ch)) scaling and f32 softmax -> zero-init 1x1
    proj -> +x). `relative_pos_embeddings` adds the T5 bias with the
    reference's hyperparameters (scale sqrt(ch), 32 buckets, max dist 64 —
    utils.py:305). Input (B, T, C).
    """

    channels: int
    num_heads: int = 1
    relative_pos_embeddings: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, c = x.shape
        h = self.num_heads
        ch = c // h
        y = GroupNorm32(self.channels)(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        # legacy layout: per head, channel axis is [q; k; v]
        qkv = qkv.reshape(b, t, h, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        if self.relative_pos_embeddings:
            w = RelativePositionBias(scale=ch ** 0.5, heads=h,
                                     num_buckets=32, max_distance=64,
                                     name="rel_pos")(w)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
        if mask is not None:  # (B, S) keep-mask, applied post-softmax like ref
            w = w * mask[:, None, None, :].astype(w.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init(),
                       name="proj_out")(a)
        return x + out


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (guided-diffusion convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class RMSNorm(nn.Module):
    """F.normalize(x) * sqrt(d) * gamma (ttts/gpt/perceiver.py:168-187)."""

    dim: int
    scale: bool = True

    @nn.compact
    def __call__(self, x):
        inv = jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        out = x * inv * math.sqrt(self.dim)
        if self.scale:
            gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
            out = out * gamma
        return out


class GEGLUFeedForward(nn.Module):
    """Linear -> GEGLU -> Linear with inner dim = dim*mult*2/3
    (ttts/gpt/perceiver.py:205-222)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult * 2 / 3)
        xg = nn.Dense(inner * 2, dtype=self.dtype)(x)
        x_, gate = jnp.split(xg, 2, axis=-1)
        # torch F.gelu defaults to the exact erf form (perceiver.py:208)
        return nn.Dense(self.dim, dtype=self.dtype)(
            jax.nn.gelu(gate, approximate=False) * x_)


class MHAttention(nn.Module):
    """Plain multi-head attention used by the perceiver
    (ttts/gpt/perceiver.py:278-318); supports cross-attn with queries
    prepended to context."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attn_include_queries: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        ctx = x if context is None else context
        if context is not None and self.cross_attn_include_queries:
            ctx = jnp.concatenate([x, ctx], axis=-2)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(*q.shape[:-1], h, dh)
        k = k.reshape(*k.shape[:-1], h, dh)
        v = v.reshape(*v.shape[:-1], h, dh)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k) * (dh ** -0.5)
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :], sim, jnp.finfo(sim.dtype).min)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class PerceiverResampler(nn.Module):
    """32 learned latents cross-attending to the conditioning mel
    (ttts/gpt/perceiver.py:225-276)."""

    dim: int
    depth: int = 2
    dim_context: Optional[int] = None
    num_latents: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, T, dim_context)
        b = x.shape[0]
        if self.dim_context is not None and self.dim_context != self.dim:
            x = nn.Dense(self.dim, dtype=self.dtype, name="proj_context")(x)
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        lat = jnp.tile(latents[None], (b, 1, 1)).astype(x.dtype)
        for i in range(self.depth):
            lat = MHAttention(
                self.dim, self.heads, self.dim_head,
                cross_attn_include_queries=True, dtype=self.dtype,
                name=f"attn_{i}",
            )(lat, x, mask=mask) + lat
            lat = GEGLUFeedForward(self.dim, self.ff_mult, dtype=self.dtype,
                                   name=f"ff_{i}")(lat) + lat
        return RMSNorm(self.dim, name="norm")(lat)
