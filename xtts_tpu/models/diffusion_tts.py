"""Legacy tortoise diffusion decoder `DiffusionTts` (flat-stack UNet-less
denoiser) — TPU re-implementation of ttts/diffusion/model.py:134-341.

Superseded in the reference's Mandarin path by AA_diffusion
(models/aa_diffusion.py) but still constructed by the tortoise api
(ttts/api.py:200,510); carried for complete component parity.

Structure (reference ctor :150-211):
  x --conv3--> [cat with integrated code_emb] --1x1--> N DiffusionLayer
  (ResBlock scale-shift + rel-pos AttentionBlock) + 3 plain ResBlocks
  --> norm/SiLU/conv3 --> (eps ; var) out.
Conditioning: either VQ codes (embedding + 3 attn "code_converter") or GPT
latents (conv + 4 attn "latent_conditioner"), modulated by the contextual
embedder's (scale, shift) over a reference mel, nearest-upsampled to the
target length, then run through 3 timestep-integrated DiffusionLayers.

Deliberate divergences (documented):
* channels-last internally ((B, T, C)); (B, C, T) at the API boundary.
* layer_drop is applied as a per-layer keep-mask drawn from the 'drop' rng
  collection — under jit both paths are compiled, so it regularizes
  identically but does not save compute (the reference's python-level skip,
  :311-319, is incompatible with a static graph).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.nn.blocks import AttentionBlock, GroupNorm32, timestep_embedding

Dtype = Any


class TimestepResBlock(nn.Module):
    """guided-diffusion ResBlock, 1-D, optional scale-shift norm
    (ttts/diffusion/model.py:60-121; efficient_config=True -> 1x1 in/skip
    convs, 3-wide out conv)."""

    channels: int
    emb_channels: int
    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool = False):  # x (B, T, C)
        pad = {1: 0, 3: 1, 5: 2}[self.kernel_size]
        h = GroupNorm32(self.channels)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (1,), padding=0, dtype=self.dtype,
                    name="in_conv")(h)
        eo = nn.Dense(2 * self.out_channels if self.use_scale_shift_norm
                      else self.out_channels, dtype=self.dtype,
                      name="emb_layers")(nn.silu(emb))[:, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(eo, 2, axis=-1)
            h = GroupNorm32(self.out_channels, name="out_norm")(h) \
                * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Conv(self.out_channels, (self.kernel_size,), padding=pad,
                        dtype=self.dtype, name="out_conv")(h)
        else:
            h = h + eo
            h = GroupNorm32(self.out_channels, name="out_norm")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Conv(self.out_channels, (self.kernel_size,), padding=pad,
                        dtype=self.dtype, name="out_conv")(h)
        if self.out_channels == self.channels:
            skip = x
        else:
            skip = nn.Conv(self.out_channels, (1,), padding=0,
                           dtype=self.dtype, name="skip")(x)
        return skip + h


class DiffusionLayer(nn.Module):
    """scale-shift ResBlock + rel-pos AttentionBlock
    (ttts/diffusion/model.py:124-132)."""

    channels: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        y = TimestepResBlock(self.channels, self.channels, self.channels,
                             dropout=self.dropout, use_scale_shift_norm=True,
                             dtype=self.dtype, name="resblk")(x, emb, train)
        return AttentionBlock(self.channels, self.num_heads,
                              relative_pos_embeddings=True, dtype=self.dtype,
                              name="attn")(y)


class DiffusionTts(nn.Module):
    """ttts/diffusion/model.py:134-341. All tensors channels-last inside."""

    model_channels: int = 512
    num_layers: int = 8
    in_channels: int = 100
    in_latent_channels: int = 512
    in_tokens: int = 8193
    out_channels: int = 200
    num_heads: int = 16
    dropout: float = 0.0
    layer_drop: float = 0.1
    unconditioned_percentage: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        mc = self.model_channels
        self.inp_block = nn.Conv(mc, (3,), padding=1, dtype=self.dtype)
        self.time_embed = [nn.Dense(mc, dtype=self.dtype),
                           nn.Dense(mc, dtype=self.dtype)]
        self.code_embedding = nn.Embed(self.in_tokens, mc)
        self.code_converter = [
            AttentionBlock(mc, self.num_heads, relative_pos_embeddings=True,
                           dtype=self.dtype) for _ in range(3)]
        self.code_norm = GroupNorm32(mc)
        self.latent_conditioner_conv = nn.Conv(mc, (3,), padding=1,
                                               dtype=self.dtype)
        self.latent_conditioner_attn = [
            AttentionBlock(mc, self.num_heads, relative_pos_embeddings=True,
                           dtype=self.dtype) for _ in range(4)]
        self.contextual_conv1 = nn.Conv(mc, (3,), strides=2, padding=1,
                                        dtype=self.dtype)
        self.contextual_conv2 = nn.Conv(mc * 2, (3,), strides=2, padding=1,
                                        dtype=self.dtype)
        self.contextual_attn = [
            AttentionBlock(mc * 2, self.num_heads,
                           relative_pos_embeddings=True, dtype=self.dtype)
            for _ in range(5)]
        self.unconditioned_embedding = self.param(
            "unconditioned_embedding", nn.initializers.normal(1.0), (1, 1, mc))
        self.conditioning_timestep_integrator = [
            DiffusionLayer(mc, self.num_heads, self.dropout, dtype=self.dtype)
            for _ in range(3)]
        self.integrating_conv = nn.Conv(mc, (1,), dtype=self.dtype)
        self.mel_head = nn.Conv(self.in_channels, (3,), padding=1,
                                dtype=self.dtype)
        self.layers = [DiffusionLayer(mc, self.num_heads, self.dropout,
                                      dtype=self.dtype)
                       for _ in range(self.num_layers)]
        self.final_res = [
            TimestepResBlock(mc, mc, mc, dropout=self.dropout,
                             use_scale_shift_norm=True, dtype=self.dtype)
            for _ in range(3)]
        self.out_norm = GroupNorm32(mc)
        self.out_conv = nn.Conv(self.out_channels, (3,), padding=1,
                                dtype=self.dtype)

    # ------------------------------------------------------------------

    def get_conditioning(self, cond_mel_bct):
        """Reference mel (B, C, T) -> (B, 2*mc) contextual vector
        (ttts/diffusion/model.py:225-233, single conditioning clip)."""
        x = jnp.swapaxes(cond_mel_bct, 1, 2)
        x = self.contextual_conv1(x)
        x = self.contextual_conv2(x)
        for blk in self.contextual_attn:
            x = blk(x)
        return x.mean(axis=1)

    def timestep_independent(self, aligned_conditioning, conditioning_latent,
                             expected_seq_len: int, return_code_pred: bool,
                             train: bool = False):
        """(ttts/diffusion/model.py:235-263). aligned_conditioning: int VQ
        codes (B, T) or GPT latents (B, C_lat, T); conditioning_latent:
        (B, 2*mc) from get_conditioning()."""
        cond_scale, cond_shift = jnp.split(conditioning_latent, 2, axis=1)
        if jnp.issubdtype(aligned_conditioning.dtype, jnp.integer):
            code_emb = self.code_embedding(aligned_conditioning)
            for blk in self.code_converter:
                code_emb = blk(code_emb)
        else:
            code_emb = self.latent_conditioner_conv(
                jnp.swapaxes(aligned_conditioning, 1, 2))
            for blk in self.latent_conditioner_attn:
                code_emb = blk(code_emb)
        code_emb = (self.code_norm(code_emb) * (1 + cond_scale[:, None])
                    + cond_shift[:, None])

        uncond_mask = jnp.zeros((code_emb.shape[0], 1, 1), bool)
        if train and self.unconditioned_percentage > 0:
            uncond_mask = (jax.random.uniform(
                self.make_rng("uncond"), (code_emb.shape[0], 1, 1))
                < self.unconditioned_percentage)
            code_emb = jnp.where(uncond_mask,
                                 self.unconditioned_embedding, code_emb)
        # nearest upsample along time to the mel length (:258)
        t_in = code_emb.shape[1]
        idx = jnp.clip((jnp.arange(expected_seq_len) * t_in)
                       // expected_seq_len, 0, t_in - 1)
        expanded = code_emb[:, idx]
        if not return_code_pred:
            return expanded
        mel_pred = self.mel_head(expanded)
        mel_pred = mel_pred * (~uncond_mask)
        return expanded, jnp.swapaxes(mel_pred, 1, 2)

    def __call__(self, x, timesteps, aligned_conditioning=None,
                 conditioning_latent=None,
                 precomputed_aligned_embeddings=None,
                 conditioning_free: bool = False,
                 return_code_pred: bool = False, train: bool = False):
        """x (B, C, T) noisy mel -> (B, 2C, T) [eps ; var]
        (ttts/diffusion/model.py:265-331)."""
        b, _, t = x.shape
        if self.is_initializing():
            # flax creates params only for executed modules; touch every
            # conditioning branch so init covers the full reference module
            # tree (the torch ctor builds all of them, :150-211)
            zc = jnp.zeros((1, 2 * self.model_channels), self.dtype)
            self.timestep_independent(jnp.zeros((1, 2), jnp.int32), zc, 4,
                                      False)
            self.timestep_independent(
                jnp.zeros((1, self.in_latent_channels, 2), self.dtype), zc,
                4, True)
            self.get_conditioning(jnp.zeros((1, self.in_channels, 8),
                                            self.dtype))
        mel_pred = None
        if conditioning_free:
            code_emb = jnp.broadcast_to(
                self.unconditioned_embedding,
                (b, t, self.model_channels)).astype(self.dtype)
        elif precomputed_aligned_embeddings is not None:
            code_emb = precomputed_aligned_embeddings
        else:
            if conditioning_latent.ndim > 2:
                conditioning_latent = self.get_conditioning(
                    conditioning_latent)
            code_emb, mel_pred = self.timestep_independent(
                aligned_conditioning, conditioning_latent, t, True, train)

        emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_embed[1](nn.silu(self.time_embed[0](emb)))
        for lyr in self.conditioning_timestep_integrator:
            code_emb = lyr(code_emb, emb, train)

        h = self.inp_block(jnp.swapaxes(x, 1, 2))
        h = jnp.concatenate([h, code_emb], axis=-1)
        h = self.integrating_conv(h)
        n_total = len(self.layers) + len(self.final_res)
        for i, lyr in enumerate(self.layers):
            y = lyr(h, emb, train)
            h = self._maybe_drop(h, y, i, n_total, train)
        for j, lyr in enumerate(self.final_res):
            y = lyr(h, emb, train)
            h = self._maybe_drop(h, y, len(self.layers) + j, n_total, train)
        h = nn.silu(self.out_norm(h.astype(jnp.float32)))
        out = jnp.swapaxes(self.out_conv(h), 1, 2)
        if return_code_pred:
            return out, mel_pred
        return out

    def _maybe_drop(self, x, y, i: int, n_total: int, train: bool):
        """Stochastic layer drop, first/last always kept (:311-314)."""
        if not train or self.layer_drop <= 0 or i == 0 or i == n_total - 1:
            return y
        keep = (jax.random.uniform(self.make_rng("drop"), ())
                >= self.layer_drop)
        return jnp.where(keep, y, x)
