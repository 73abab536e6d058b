"""Bidirectional transformer encoder with rotary positions and RMSNorm.

TPU-native stand-in for the reference's vendored x-transformers clone
(ttts/utils/xtransformers.py:479-1030 — Encoder with rotary_pos_emb=True,
use_rmsnorm=True, ff_glu) used by the CLVP text/speech towers
(ttts/clvp/model.py:45-76). Built as plain linen modules: full-sequence
bidirectional attention (no cache path needed), GLU feed-forward, f32 softmax,
padding handled by a (B, T) keep-mask.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
NEG_INF = -1e9


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rotary_embed(t: int, dim: int, base: float = 10000.0):
    """(T, dim) cos/sin tables over the first `dim` channels."""
    inv = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.outer(jnp.arange(t, dtype=jnp.float32), inv)  # (T, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary(x, cos, sin):
    """x: (B, T, H, hd); rotate the leading rot_dim channels."""
    rot = cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    x_rot = x_rot * cos + rotate_half(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class RMSNorm(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) + 1e-8)
        return (normed * scale).astype(self.dtype)


class EncoderAttention(nn.Module):
    dim: int
    heads: int
    rotary_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, t, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        cos, sin = rotary_embed(t, min(self.rotary_dim, hd))
        q = apply_rotary(q, cos.astype(q.dtype), sin.astype(q.dtype))
        k = apply_rotary(k, cos.astype(k.dtype), sin.astype(k.dtype))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :].astype(bool),
                               logits, NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="out")(y)


class GLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        gate_up = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype,
                           name="wi")(x)
        u, g = jnp.split(gate_up, 2, axis=-1)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="wo")(u * jax.nn.gelu(g, approximate=False))


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm1 = RMSNorm(dtype=self.dtype)
        self.attn = EncoderAttention(self.dim, self.heads, dtype=self.dtype)
        self.norm2 = RMSNorm(dtype=self.dtype)
        self.ff = GLUFeedForward(self.dim, dtype=self.dtype)

    def __call__(self, x, mask=None):
        x = x + self.attn(self.norm1(x), mask)
        x = x + self.ff(self.norm2(x))
        return x


class TransformerEncoder(nn.Module):
    """depth x EncoderBlock + final RMSNorm; returns per-token features."""

    depth: int
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.blocks = [EncoderBlock(self.dim, self.heads, dtype=self.dtype,
                                    name=f"block_{i}")
                       for i in range(self.depth)]
        self.final_norm = RMSNorm(dtype=self.dtype)

    def __call__(self, x, mask=None):
        for blk in self.blocks:
            x = blk(x, mask)
        return self.final_norm(x)


class TortoiseAttention(nn.Module):
    """Bidirectional attention of ttts/utils/transformer.py:135-179: fixed
    dim_head (inner = heads*dim_head, independent of dim), biasless qkv,
    biased out projection, pre-softmax -inf masking."""

    dim: int
    heads: int
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, t, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, t, self.heads, self.dim_head)
        v = v.reshape(b, t, self.heads, self.dim_head)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :].astype(bool),
                               logits, NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(y)


class TortoiseEncoderBlock(nn.Module):
    """x += scale_a * attn(ln(x)); x += scale_f * geglu_ff(ln(x)) — the
    LayerScale/PreNorm/SequentialSequence composition of
    ttts/utils/transformer.py:50-115,182-223. `depth_index` (1-based) sets
    the LayerScale init (0.1 / 1e-5 / 1e-6 per :82-88)."""

    dim: int
    heads: int
    depth_index: int
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        init_eps = (0.1 if self.depth_index <= 18
                    else 1e-5 if self.depth_index <= 24 else 1e-6)
        scale_a = self.param("scale_attn",
                             nn.initializers.constant(init_eps), (self.dim,))
        scale_f = self.param("scale_ff",
                             nn.initializers.constant(init_eps), (self.dim,))
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_attn")(x).astype(x.dtype)
        h = TortoiseAttention(self.dim, self.heads, dtype=self.dtype,
                              name="attn")(h, mask)
        x = x + h * scale_a
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_ff")(x).astype(x.dtype)
        inner = self.dim * self.ff_mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="ff_in")(h)
        a, gates = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gates, approximate=False)   # GEGLU (:113-116)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return x + h * scale_f


class TortoiseEncoder(nn.Module):
    """The reference CLVP's LIVE tower (use_xformers=False default,
    ttts/clvp/model.py:86-89): learned abs positions are added by the
    caller; no final norm."""

    depth: int
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.blocks = [TortoiseEncoderBlock(self.dim, self.heads, i + 1,
                                            dtype=self.dtype,
                                            name=f"layer_{i}")
                       for i in range(self.depth)]

    def __call__(self, x, mask=None):
        for blk in self.blocks:
            x = blk(x, mask)
        return x


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(B, T, D) x (B, T) -> (B, D); plain mean when mask is None
    (ttts/clvp/model.py:15-17 masked_mean)."""
    if mask is None:
        return x.mean(axis=1)
    m = mask.astype(x.dtype)[..., None]
    return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
