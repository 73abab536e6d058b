"""From-scratch GPT-2 style transformer core.

Replaces the reference's HuggingFace GPT2Model + DeepSpeed inference + HF
generate KV cache (ttts/gpt/model.py:246-266, :363-399) with one linen stack
that has two execution modes:

* `__call__`: full-sequence causal forward (training / prefill). The prefill
  also returns the K/V tensors laid into a preallocated, static-shape cache.
* `decode_step`: one token through all layers against the cache —
  the AR hot loop, driven by `lax.scan` from the caller so the whole decode
  compiles to a single XLA while-program.

Matches HF GPT2 numerics: pre-LN (eps 1e-5), gelu_new MLP, softmax in f32,
1/sqrt(head_dim) scaling, learned positions handled by the caller (the
reference nulls wpe and adds its own segment position embeddings,
ttts/gpt/model.py:260-262).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_INF = -1e9


def gelu_new(x):
    """HF "gelu_new" (tanh approximation) used by GPT2."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


class KVCache(NamedTuple):
    """Preallocated decode cache: (layers, B, S_max, heads, head_dim)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, layers: int, batch: int, max_len: int, heads: int,
              head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (layers, batch, max_len, heads, head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class SelfAttention(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def qkv(self, x):
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t = x.shape[:2]
        hd = self.dim // self.heads
        shp = (b, t, self.heads, hd)
        return q.reshape(shp), k.reshape(shp), v.reshape(shp)

    def out(self, a, b, t):
        a = a.reshape(b, t, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="c_proj")(a)

    @nn.compact
    def __call__(self, x, attn_mask=None, cache_kv=None, cache_index=None,
                 full_cache_len=None):
        """Full-sequence causal attention.

        attn_mask: optional (B, T) keep-mask for padded positions.
        Returns (y, (k, v)) so prefill can seed the decode cache.
        """
        b, t, _ = x.shape
        q, k, v = self.qkv(x)
        hd = self.dim // self.heads
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        causal = jnp.tril(jnp.ones((t, t), bool))
        mask = causal[None, None]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return self.out(y, b, t), (k, v)

    @nn.compact
    def step(self, x, cache: "KVCache", layer: int, index):
        """Single-token decode against the stacked cache.

        x: (B, 1, D); cache arrays (L, B, S, H, hd); index: current position.
        Updates cache[layer] in place (dynamic_update_slice on the stacked
        buffer so XLA keeps it in-place inside the scan) and returns
        (y, new_cache).
        """
        b = x.shape[0]
        q, k, v = self.qkv(x)  # (B, 1, H, hd)
        kc = jax.lax.dynamic_update_slice(
            cache.k, k[None].astype(cache.k.dtype), (layer, 0, index, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            cache.v, v[None].astype(cache.v.dtype), (layer, 0, index, 0, 0))
        k_all = kc[layer]  # (B, S, H, hd)
        v_all = vc[layer]
        hd = self.dim // self.heads
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_all.astype(q.dtype)) * scale
        pos = jnp.arange(k_all.shape[1])
        valid = (pos <= index)[None, None, None, :]
        logits = jnp.where(valid, logits, NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", w, v_all.astype(x.dtype))
        return self.out(y, b, 1), KVCache(kc, vc)


class MLP(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="c_fc")(x)
        h = gelu_new(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="c_proj")(h)


class Block(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln_1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.attn = SelfAttention(self.dim, self.heads, dtype=self.dtype)
        self.ln_2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.mlp = MLP(self.dim, dtype=self.dtype)

    def __call__(self, x, attn_mask=None):
        a, kv = self.attn(self.ln_1(x).astype(x.dtype), attn_mask)
        x = x + a
        x = x + self.mlp(self.ln_2(x).astype(x.dtype))
        return x, kv

    def step(self, x, cache: KVCache, layer: int, index):
        a, cache = self.attn.step(self.ln_1(x).astype(x.dtype), cache, layer, index)
        x = x + a
        x = x + self.mlp(self.ln_2(x).astype(x.dtype))
        return x, cache


class _BlockNoKV(Block):
    """Block whose __call__ drops the K/V output — the lax.scan body for
    the scanned stack (a scan that carried the per-layer K/V stack would
    allocate a dead (L, B, T, H, hd) pair; returning None keeps the loop
    state minimal without relying on XLA's dead-tuple elimination)."""

    def __call__(self, x, attn_mask=None):
        x, _ = super().__call__(x, attn_mask)
        return x, None


class GPT2Stack(nn.Module):
    """n_layer pre-LN blocks + final LayerNorm (HF GPT2Model equivalent).

    remat: per-block gradient checkpointing policy (xtts_tpu/nn/remat.py) —
    the TPU counterpart of HF `gradient_checkpointing`
    (ttts/gpt/model.py:257). Params and the decode path are unaffected;
    only training-backward memory/FLOPs change.

    scan: execute the layers as ONE `nn.scan`d block with params stacked on
    a leading L axis (name "h_scan") instead of L unrolled blocks. Math-
    identical (same Block, same op order per layer; tests/test_gpt.py pins
    equality), but the lowered program is ~L× smaller — built for the
    frozen teacher-forced latent forward, whose UNROLLED bs>=2 program
    pathologically hangs the tunneled chip's remote XLA compile (>28 min
    Broken pipe, PERF.md round-5 phase-13 diagnosis) while everything
    around it compiles in minutes. Convert unrolled checkpoint params with
    `stack_layer_params` / `scan_gpt_variables`. Only the plain forward is
    supported (prefill/decode use the unrolled stack, which compiles fine
    as a B=1 while-loop program)."""

    layers: int
    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    remat: str = "none"
    scan: bool = False

    def setup(self):
        from xtts_tpu.nn.remat import maybe_remat
        if self.scan:
            scan_cls = nn.scan(
                maybe_remat(_BlockNoKV, self.remat),
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.layers,
                in_axes=nn.broadcast)
            self.h_scan = scan_cls(self.dim, self.heads, dtype=self.dtype,
                                   name="h_scan")
            self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
            return
        block_cls = maybe_remat(Block, self.remat)
        self.blocks = [block_cls(self.dim, self.heads, dtype=self.dtype,
                                 name=f"h_{i}") for i in range(self.layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)

    def __call__(self, x, attn_mask=None, collect_kv: bool = False):
        if self.scan:
            if collect_kv:
                raise ValueError(
                    "GPT2Stack(scan=True) supports only the plain forward; "
                    "prefill/decode paths use the unrolled stack")
            x, _ = self.h_scan(x, attn_mask)
            return x, self.ln_f(x).astype(x.dtype)
        kvs = []
        for blk in self.blocks:
            x, kv = blk(x, attn_mask)
            if collect_kv:
                kvs.append(kv)
        hidden = x
        normed = self.ln_f(x).astype(x.dtype)
        if collect_kv:
            k = jnp.stack([kv[0] for kv in kvs])  # (L, B, T, H, hd)
            v = jnp.stack([kv[1] for kv in kvs])
            return hidden, normed, (k, v)
        return hidden, normed

    def prefill(self, x, cache: KVCache, attn_mask=None):
        """Run the prefix, seed the cache at positions [0, T)."""
        hidden, normed, (k, v) = self(x, attn_mask, collect_kv=True)
        kc = jax.lax.dynamic_update_slice(
            cache.k, k.astype(cache.k.dtype), (0, 0, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            cache.v, v.astype(cache.v.dtype), (0, 0, 0, 0, 0))
        return hidden, normed, KVCache(kc, vc)

    def decode_step(self, x, cache: KVCache, index):
        """One token through all layers. x: (B, 1, D)."""
        for i, blk in enumerate(self.blocks):
            x, cache = blk.step(x, cache, i, index)
        normed = self.ln_f(x).astype(x.dtype)
        return normed, cache


def stack_layer_params(stack_params, layers: int):
    """Convert unrolled GPT2Stack params ({h_0..h_{L-1}, ln_f}) to the
    scan layout ({h_scan: leaves stacked on a leading L axis, ln_f}).

    Pure restructuring — `GPT2Stack(scan=True).apply` on the converted tree
    computes the same function as the unrolled stack on the original."""
    hs = [stack_params[f"h_{i}"] for i in range(layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *hs)
    rest = {k: v for k, v in stack_params.items()
            if not (k.startswith("h_") and k[2:].isdigit())}
    rest["h_scan"] = stacked
    return rest


def scan_gpt_variables(variables, layers: int, submodule: str = "gpt"):
    """UnifiedVoice variables with params[submodule] converted for
    scan_stack=True execution (see GPT2Stack.scan)."""
    v = dict(variables)
    p = dict(v["params"])
    p[submodule] = stack_layer_params(dict(p[submodule]), layers)
    v["params"] = p
    return v
