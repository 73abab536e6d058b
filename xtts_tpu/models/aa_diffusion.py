"""AA_diffusion: ReferenceNet-conditioned UNet1D diffusion decoder
(TPU re-design of ttts/diffusion/aa_model.py + the live parts of
ttts/diffusion/ldm/modules/* and ttts/diffusion/cldm/*).

Three towers (aa_model.py:307-339):
* `CLIPRefEncoder` — ViT over the reference mel as a 1-D "image"
  (cond_emb.py:144-186, transformer.py:328-567): conv k=32/s=32 patchify,
  class token, learned positions, 6 pre-LN blocks, ln_post, L2-normalized
  token sequence used as cross-attention context. Timestep-independent, so
  inference hoists it out of the sampling loop (the reference recomputes it
  all 50 steps — aa_model.py:336).
* `ReferenceNet` — the same UNet trunk run on the reference mel; each
  SpatialTransformer exports its block input, which the base model's
  self-attention concatenates onto its own sequence
  (attention.py:274-290, openaimodel.py:73-97).
* `BaseModel` — UNet1D (no actual up/downsampling: channel_mult (1,1), the
  `ds *= 2` is commented out at aa_model.py:225): initial conv + hint
  injection, [ResBlock + SpatialTransformer] x4 + 2 plain ResBlocks,
  GroupNorm/SiLU/zero-conv head -> 200ch (eps + learned-range var).

Classifier-free branch replaces the GPT-latent hint with a learned embedding
(aa_model.py:319-331); ReferenceNet/CLIP do not depend on the hint, so CFG
costs only a second BaseModel pass here (batched), not a full second forward.

Layout: channels-last (B, T, C) internally; (B, C, T) at the API edges.
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.core.config import CLIPRefConfig, DiffusionModelConfig
from xtts_tpu.nn.blocks import timestep_embedding

Dtype = Any


def _zero_init():
    return nn.initializers.zeros


class GroupNorm32(nn.Module):
    """32-group norm in f32 (ldm normalization); falls back to the tortoise
    divisibility rule for small test channel counts."""

    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from xtts_tpu.nn.blocks import tortoise_group_count
        g = self.groups
        if x.shape[-1] % g != 0:
            g = tortoise_group_count(x.shape[-1])
        orig = x.dtype
        y = nn.GroupNorm(num_groups=g, epsilon=self.eps,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(orig)


class UNetResBlock(nn.Module):
    """openaimodel.py ResBlock, 1-D, no scale-shift-norm, identity skip."""

    channels: int
    emb_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = GroupNorm32()(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        e = nn.Dense(self.channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, :]
        h = GroupNorm32()(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.channels, (3,), padding=1, dtype=self.dtype,
                    kernel_init=_zero_init(), bias_init=_zero_init(),
                    name="out_conv")(h)
        return x + h


def _use_flash(tq: int, tk: int) -> bool:
    """Trace-time gate for the flash-attention path: TPU backend, the
    kernel importable, the score matrix big enough that skipping its HBM
    materialization wins (threshold 2^19 ~ the render/train consumer
    attn1 shapes; attn2's ~100-token CLIP context stays on einsum), and
    not disabled via XTTS_FLASH_ATTN=0."""
    import os
    if os.environ.get("XTTS_FLASH_ATTN", "auto") == "0":
        return False
    if tq * tk < (1 << 19):
        return False
    from xtts_tpu.nn.flash_attn import flash_available
    return flash_available()


class CrossAttention(nn.Module):
    """ldm attention.py CrossAttention: biasless qkv, f32 softmax."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(*q.shape[:-1], h, dh)
        k = k.reshape(*k.shape[:-1], h, dh)
        v = v.reshape(*v.shape[:-1], h, dh)
        if self.flash and _use_flash(q.shape[1], k.shape[1]):
            # big self-attention ([x ; refer] consumer rows): Pallas flash
            # kernel — never materializes the (B,H,Tq,Tk) score matrix
            # that makes the einsum path bandwidth-bound (~51% of the
            # denoise step at 21% MFU, PERF.md round-5 phase 17). Exact
            # attention math, f32 online softmax; differs from the einsum
            # path only in summation order. XTTS_FLASH_ATTN=0 disables.
            from xtts_tpu.nn.flash_attn import flash_mha
            out = flash_mha(q, k, v, dh ** -0.5)
        else:
            sim = jnp.einsum("bihd,bjhd->bhij", q, k) * (dh ** -0.5)
            attn = jax.nn.softmax(sim.astype(jnp.float32),
                                  axis=-1).astype(sim.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU_FF(nn.Module):
    """attention.py FeedForward with glu gating, mult 4."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        xg = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        a, gate = jnp.split(xg, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(
            a * nn.gelu(gate, approximate=False))


class BasicTransformerBlock(nn.Module):
    """attention.py:246-290. `refer=None` -> producer mode (returns its input
    as the reference feature); `refer` given -> consumer mode (self-attention
    over [x ; refer] then truncate)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: Dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, x, context, refer=None, skip=()):
        produced = x if refer is None else None
        ln1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")
        ln2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")
        ln3 = nn.LayerNorm(dtype=jnp.float32, name="norm3")
        attn1 = CrossAttention(self.dim, heads=self.heads, dim_head=self.dim_head,
                               dtype=self.dtype, flash=self.flash,
                               name="attn1")
        attn2 = CrossAttention(self.dim, context_dim=self.context_dim,
                               heads=self.heads, dim_head=self.dim_head,
                               dtype=self.dtype, name="attn2")
        ff = GEGLU_FF(self.dim, dtype=self.dtype, name="ff")

        if refer is None:
            xa = x                                    # producer: plain self-attn
        else:
            xa = jnp.concatenate([x, refer], axis=1)  # consumer: attend over both
        t_len = x.shape[1]
        if "attn1" not in skip:
            xa_n = ln1(xa).astype(xa.dtype)
            if refer is None:
                xa = attn1(xa_n) + xa
            else:
                # the reference truncates the refer rows right after attn1
                # (x = self.attn1(...); x[:, :x_len], attention.py:282-284),
                # so their query rows are dead — compute queries only for the
                # x rows against the full [x ; refer] K/V: identical outputs
                # for the kept rows, ~Tr/(Tx+Tr) less attention work
                xa = attn1(xa_n[:, :t_len], context=xa_n) + xa[:, :t_len]
        y = xa[:, :t_len]
        if "attn2" not in skip:
            y = attn2(ln2(y).astype(y.dtype), context) + y
        if "ff" not in skip:
            y = ff(ln3(y).astype(y.dtype)) + y
        if produced is not None:
            return y, produced
        return y


class SpatialTransformer1D(nn.Module):
    """attention.py:297-380 with 1x1-conv in/out projections (use_linear
    False) and zero-init proj_out."""

    channels: int
    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    dtype: Dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, x, context, refer=None, skip=()):
        x_in = x
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        h = nn.Dense(self.heads * self.dim_head, dtype=self.dtype,
                     name="proj_in")(h)
        produced = None
        for d in range(self.depth):
            blk = BasicTransformerBlock(
                self.heads * self.dim_head, self.heads, self.dim_head,
                self.context_dim, dtype=self.dtype, flash=self.flash,
                name=f"block_{d}")
            if refer is None:
                h, produced = blk(h, context)
            else:
                h = blk(h, context, refer, skip=skip)
        h = nn.Dense(self.channels, dtype=self.dtype, kernel_init=_zero_init(),
                     name="proj_out")(h)
        out = h + x_in
        if refer is None:
            return out, produced
        return out


class UNetTrunk(nn.Module):
    """Shared trunk of BaseModel/ReferenceNet (aa_model.py:152-227):
    initial conv + per-level [ResBlock, SpatialTransformer] x n + closing
    ResBlock. channel_mult is all-1 so channels stay at model_channels."""

    cfg: DiffusionModelConfig
    dtype: Dtype = jnp.float32
    flash: bool = False

    def setup(self):
        from xtts_tpu.nn.remat import maybe_remat
        c = self.cfg
        # LDM use_checkpoint equivalent (attention.py:270-272): remat each
        # ResBlock/SpatialTransformer on the backward pass per cfg.remat
        res_cls = maybe_remat(UNetResBlock, c.remat)
        attn_cls = maybe_remat(SpatialTransformer1D, c.remat)
        self.in_conv = nn.Conv(c.model_channels, (3,), padding=1,
                               dtype=self.dtype, name="in_conv")
        res, attn = [], []
        n_attn = 0
        for level, _ in enumerate(c.channel_mult):
            for _ in range(c.num_res_blocks):
                res.append(res_cls(c.model_channels, 4 * c.model_channels,
                                   c.dropout, dtype=self.dtype))
                attn.append(attn_cls(
                    c.model_channels, c.num_heads,
                    c.model_channels // c.num_heads, c.context_dim,
                    depth=c.transformer_depth, dtype=self.dtype,
                    flash=self.flash))
                n_attn += 1
            res.append(res_cls(c.model_channels, 4 * c.model_channels,
                               c.dropout, dtype=self.dtype))
        self.res_blocks = res
        self.attn_blocks = attn
        self.time_fc1 = nn.Dense(4 * c.model_channels, dtype=self.dtype)
        self.time_fc2 = nn.Dense(4 * c.model_channels, dtype=self.dtype)

    def time_embed(self, t):
        e = timestep_embedding(t, self.cfg.model_channels)
        return self.time_fc2(nn.silu(self.time_fc1(e.astype(self.dtype))))

    def run(self, x, emb, context, refers=None, hint=None, skip=()):
        """x (B,T,C_in). refers: list of reference features (consumer) or
        None (producer — returns the list). hint added after the first block
        (aa_model.py:264-268). skip: profiling ablations (see
        AADiffusion.denoise)."""
        c = self.cfg
        produced: List[jnp.ndarray] = []
        h = self.in_conv(x)
        if hint is not None:
            h = h + hint
        ri = 0
        blocks_per_level = c.num_res_blocks + 1
        idx = 0
        for level, _ in enumerate(c.channel_mult):
            for j in range(c.num_res_blocks):
                if "res" not in skip:
                    h = self.res_blocks[idx](h, emb)
                attn = self.attn_blocks[ri]
                if refers is None:
                    h, p = attn(h, context)
                    produced.append(p)
                else:
                    h = attn(h, context, refers[ri], skip=skip)
                ri += 1
                idx += 1
            if "res" not in skip:
                h = self.res_blocks[idx](h, emb)
            idx += 1
        if refers is None:
            return h, produced
        return h


class CLIPRefEncoder(nn.Module):
    """ViT over the reference mel; returns L2-normalized token sequence
    (cond_emb.py CLIP.encode_image(normalize=True) -> full-sequence early
    return at transformer.py:503-520)."""

    cfg: CLIPRefConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_btc, train: bool = False):
        c = self.cfg
        b = mel_btc.shape[0]
        scale = c.width ** -0.5
        # patchify: conv k=patch s=patch, no bias
        t = mel_btc.shape[1] - mel_btc.shape[1] % c.patch_size
        x = nn.Conv(c.width, (c.patch_size,), strides=(c.patch_size,),
                    use_bias=False, padding="VALID", dtype=self.dtype,
                    name="conv1")(mel_btc[:, :t])
        cls = self.param("class_embedding",
                         nn.initializers.normal(scale), (c.width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(x.dtype), x],
                            axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(scale),
                         (c.max_patches + 1, c.width))
        x = x + pos[: x.shape[1]].astype(x.dtype)
        if train and c.patch_dropout > 0.0:
            # PatchDropout (transformer.py:49-83, applied after pos-embed at
            # :513; config.yaml clip.patch_dropout=0.4 during training):
            # keep a random max(1, int(n*(1-p))) patch subset per row, cls
            # token always kept. Static keep-count -> static shapes.
            cls_tok, patches = x[:, :1], x[:, 1:]
            n = patches.shape[1]
            keep = max(1, int(n * (1.0 - c.patch_dropout)))
            rand = jax.random.normal(self.make_rng("patch_drop"), (b, n))
            _, idx = jax.lax.top_k(rand, keep)                  # (B, keep)
            patches = jnp.take_along_axis(patches, idx[..., None], axis=1)
            x = jnp.concatenate([cls_tok, patches], axis=1)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_pre")(x).astype(x.dtype)
        heads = c.width // c.head_width
        for i in range(c.layers):
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(x).astype(x.dtype)
            y = nn.MultiHeadDotProductAttention(
                num_heads=heads, dtype=self.dtype, name=f"attn_{i}")(y, y)
            x = x + y
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(x).astype(x.dtype)
            y = nn.Dense(int(c.width * c.mlp_ratio), dtype=self.dtype,
                         name=f"mlp_fc_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(c.width, dtype=self.dtype, name=f"mlp_proj_{i}")(y)
            x = x + y
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x).astype(x.dtype)
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)


def nearest_resize_time(x_btc: jnp.ndarray, t_out: int) -> jnp.ndarray:
    """F.interpolate(mode='nearest') along the time axis."""
    t_in = x_btc.shape[1]
    idx = (jnp.arange(t_out) * t_in) // t_out
    return jnp.take(x_btc, idx, axis=1)


class AADiffusion(nn.Module):
    """Full model; see module docstring. API uses (B, C, T) like the ref."""

    cfg: DiffusionModelConfig = DiffusionModelConfig()
    dtype: Dtype = jnp.float32
    # flash attention in the consumer self-attn: INFERENCE-ONLY default.
    # fwd-only it is ~parity in step time with a 30-100x compile-time win;
    # under fwd+bwd the kernel's dq/dkv passes at head_dim 64 cost ~27%
    # step time (ab_split_fused{,_noflash}.log) — trainers leave it False.
    flash: bool = False

    def setup(self):
        c = self.cfg
        self.refer_enc = CLIPRefEncoder(c.clip, dtype=self.dtype)
        self.refer_model = UNetTrunk(c, dtype=self.dtype, flash=self.flash)
        self.base_model = UNetTrunk(c, dtype=self.dtype, flash=self.flash)
        self.hint_converter = nn.Conv(c.model_channels, (3,), padding=1,
                                      dtype=self.dtype)
        self.out_norm = GroupNorm32()
        self.out_conv = nn.Conv(c.out_channels, (3,), padding=1,
                                dtype=self.dtype, kernel_init=_zero_init(),
                                bias_init=_zero_init(), name="out_conv")
        self.unconditioned_cat_embedding = self.param(
            "unconditioned_cat_embedding", nn.initializers.normal(1.0),
            (1, 1, c.in_latent_channels))

    # --- stages (so inference can hoist/batch) ---

    def encode_reference(self, refer_bct: jnp.ndarray,
                         train: bool = False) -> jnp.ndarray:
        """CLIP context tokens — timestep-independent. train=True enables
        the reference's PatchDropout regularizer (needs a 'patch_drop' rng)."""
        return self.refer_enc(jnp.swapaxes(refer_bct, 1, 2), train=train)

    def reference_features(self, refer_bct, t, refer_cross):
        """ReferenceNet control features for timestep t (list of (B,Tr,C))."""
        x = jnp.swapaxes(refer_bct, 1, 2)
        emb = self.refer_model.time_embed(t)
        _, produced = self.refer_model.run(x, emb, refer_cross, refers=None)
        return produced

    def denoise(self, x_bct, t, hint_bct, refer_cross, control, skip=()):
        """BaseModel pass. hint_bct: (B, latent_ch, Tx) already resized.

        skip: component names to bypass ("attn1"/"attn2"/"ff"/"res") —
        ablation knob for scripts/profile_diffusion.py ONLY; params are
        unchanged (flax ignores unvisited params under apply)."""
        x = jnp.swapaxes(x_bct, 1, 2)
        hint = self.hint_converter(jnp.swapaxes(hint_bct, 1, 2))
        emb = self.base_model.time_embed(t)
        h = self.base_model.run(x, emb, refer_cross, refers=control,
                                hint=hint, skip=skip)
        h = nn.silu(self.out_norm(h))
        out = self.out_conv(h)
        return jnp.swapaxes(out, 1, 2)

    def uncond_hint(self, b: int, t_len: int) -> jnp.ndarray:
        """(B, latent_ch, T) tiled unconditioned embedding (aa_model.py:330-331)."""
        e = jnp.swapaxes(self.unconditioned_cat_embedding, 1, 2)  # (1, C, 1)
        return jnp.tile(e, (b, 1, t_len))

    def __call__(self, x_bct, t, hint_bct, refer_bct,
                 conditioning_free: bool = False,
                 uncond_mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """Reference-facsimile forward (aa_model.py:329-339).

        uncond_mask: optional (B,) bool — training CFG dropout already drawn
        by the caller (get_uncond_batch semantics).
        train: enable CLIP PatchDropout (training only; pass a 'patch_drop'
        rng via apply(..., rngs={'patch_drop': key}))."""
        b, _, t_x = x_bct.shape
        if conditioning_free:
            hint_bct = self.uncond_hint(b, t_x)
        else:
            if uncond_mask is not None:
                uc = self.uncond_hint(b, hint_bct.shape[-1])
                hint_bct = jnp.where(uncond_mask[:, None, None], uc, hint_bct)
            hint_bct = jnp.swapaxes(
                nearest_resize_time(jnp.swapaxes(hint_bct, 1, 2), t_x), 1, 2)
        refer_cross = self.encode_reference(refer_bct, train=train)
        control = self.reference_features(refer_bct, t, refer_cross)
        return self.denoise(x_bct, t, hint_bct, refer_cross, control)


TACOTRON_MEL_MAX = 5.5451774444795624753378569716654
TACOTRON_MEL_MIN = -16.118095650958319788125940182791


def normalize_tacotron_mel(mel):
    """clamp + 0.18215 scale (aa_model.py:296-300)."""
    return jnp.clip(mel, min=-TACOTRON_MEL_MAX) * 0.18215


def denormalize_tacotron_mel(norm_mel):
    return norm_mel / 0.18215
