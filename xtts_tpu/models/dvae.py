"""DiscreteVAE mel quantizer (TPU-native re-design of ttts/vqvae/xtts_dvae.py).

Architecture for the shipped config (ttts/gpt/config.json "vqvae": channels
100, hidden 512, num_layers 2, kernel 3, 3 resblocks, codebook 8192x512,
UpsampledConv decoder), derived from the builders at
ttts/vqvae/xtts_dvae.py:253-293:

  encoder: conv s2 100->512 +relu | conv s2 512->1024 +relu
           | ResBlock(1024) x3 | conv1x1 1024->512
  decoder: conv1x1 512->1024 | ResBlock(1024) x3
           | nearest-up x2 + conv 1024->1024 +relu
           | nearest-up x2 + conv 1024->512  +relu | conv1x1 512->100

The EMA codebook (Quantize, ttts/vqvae/xtts_dvae.py:52-130) is functional
state: `quantize()` returns codes + the batch statistics, and
`ema_codebook_update()` folds them in — with `lax.psum` over the data mesh
axis replacing the reference's torch.distributed.all_reduce (:108-110).
Nearest-code search runs the fused Pallas kernel (xtts_tpu/ops/vq.py) on TPU.

Layout: channels-last (B, T, C) internally; (B, C=mel, T) at the API edges to
match the reference call signatures.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.core.config import DVAEConfig
from xtts_tpu.ops.vq import vq_nearest

Dtype = Any


def _activation(name: str):
    """relu | silu, like the reference ctor (xtts_dvae.py:246-251)."""
    if name == "relu":
        return nn.relu
    if name == "silu":
        return nn.silu
    raise NotImplementedError(f"DVAE activation {name!r} (relu|silu)")


class ResBlock(nn.Module):
    """conv3-act-conv3-act-conv1 + x (ttts/vqvae/xtts_dvae.py:172-184)."""

    chan: int
    dtype: Dtype = jnp.float32
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.chan, (3,), padding=1, dtype=self.dtype)(x)
        h = self.act(h)
        h = nn.Conv(self.chan, (3,), padding=1, dtype=self.dtype)(h)
        h = self.act(h)
        h = nn.Conv(self.chan, (1,), dtype=self.dtype)(h)
        return h + x


class DVAEEncoder(nn.Module):
    cfg: DVAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, T, mel) -> (B, T/4, codebook_dim) pre-VQ logits."""
        c = self.cfg
        act = _activation(c.activation)
        chans = [c.hidden_dim * 2 ** i for i in range(c.num_layers)]
        pad = (c.kernel_size - 1) // 2
        for out_ch in chans:
            x = nn.Conv(out_ch, (c.kernel_size,), strides=(c.stride,),
                        padding=pad, dtype=self.dtype)(x)
            x = act(x)
        inner = chans[-1]
        for i in range(c.num_resnet_blocks):
            x = ResBlock(inner, dtype=self.dtype, act=act, name=f"res{i}")(x)
        return nn.Conv(c.codebook_dim, (1,), dtype=self.dtype, name="to_codes")(x)


class DVAEDecoder(nn.Module):
    cfg: DVAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_penult: bool = False):
        """(B, N, codebook_dim) -> (B, 4N, mel)."""
        c = self.cfg
        act = _activation(c.activation)
        enc_chans = [c.hidden_dim * 2 ** i for i in range(c.num_layers)]
        dec_chans = list(reversed(enc_chans))           # [1024, 512]
        inner = dec_chans[0]
        pad = (c.kernel_size - 1) // 2

        x = nn.Conv(inner, (1,), dtype=self.dtype, name="from_codes")(x)
        for i in range(c.num_resnet_blocks):
            x = ResBlock(inner, dtype=self.dtype, act=act, name=f"res{i}")(x)
        io = list(zip([inner] + dec_chans, dec_chans))   # [(1024,1024),(1024,512)]
        for i, (_, out_ch) in enumerate(io[: c.num_layers]):
            if c.use_transposed_convs:
                # torch ConvTranspose1d(k, s, p=(k-1)//2) == zero-dilated
                # correlation: out length = s*L - 1 for k=3/s=2/p=1
                # (xtts_dvae.py:241,273; the reference class default — the
                # shipped config uses UpsampledConv instead)
                x = nn.Conv(out_ch, (c.kernel_size,),
                            input_dilation=(c.stride,),
                            padding=((pad, pad),), dtype=self.dtype,
                            name=f"up{i}")(x)
            else:
                # UpsampledConv: nearest x stride then conv (xtts_dvae.py:187-197)
                x = jnp.repeat(x, c.stride, axis=1)
                x = nn.Conv(out_ch, (c.kernel_size,), padding=pad,
                            dtype=self.dtype, name=f"up{i}")(x)
            x = act(x)
        penult = x
        out = nn.Conv(c.channels, (1,), dtype=self.dtype, name="to_mel")(x)
        if return_penult:
            return out, penult
        return out


class CodebookState(NamedTuple):
    """EMA codebook buffers (Quantize registers, xtts_dvae.py:67-70)."""

    embed: jnp.ndarray        # (dim, n_embed)
    cluster_size: jnp.ndarray  # (n_embed,)
    embed_avg: jnp.ndarray    # (dim, n_embed)


def init_codebook(key, dim: int, n_embed: int) -> CodebookState:
    embed = jax.random.normal(key, (dim, n_embed), jnp.float32)
    return CodebookState(embed, jnp.zeros((n_embed,), jnp.float32), embed)


class QuantizeResult(NamedTuple):
    quantized: jnp.ndarray     # straight-through (B, N, dim)
    codes: jnp.ndarray         # (B, N) int32
    commitment_loss: jnp.ndarray
    onehot_sum: jnp.ndarray    # (n_embed,) batch stats for EMA
    embed_sum: jnp.ndarray     # (dim, n_embed)


def quantize(x: jnp.ndarray, cb: CodebookState) -> QuantizeResult:
    """Nearest-code lookup + straight-through estimator
    (ttts/vqvae/xtts_dvae.py:87-127)."""
    codes = vq_nearest(x, cb.embed)
    quant = jnp.take(cb.embed.T, codes, axis=0, mode="clip")  # embed_code (:129-130)
    commitment = jnp.mean((jax.lax.stop_gradient(quant) - x) ** 2)
    st = x + jax.lax.stop_gradient(quant - x)
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    onehot = jax.nn.one_hot(codes.reshape(-1), cb.embed.shape[1], dtype=jnp.float32)
    return QuantizeResult(
        st, codes, commitment,
        onehot.sum(axis=0), flat.T @ onehot,
    )


class BalanceState(NamedTuple):
    """Tumbling-window code-usage histogram for the balancing heuristic."""

    hist: jnp.ndarray    # (n_embed,) f32 — counts in the current window
    total: jnp.ndarray   # scalar f32


def balance_codebook(cb: CodebookState, bal: BalanceState,
                     onehot_sum: jnp.ndarray, key: jax.Array,
                     window: int = 64000, hi: float = 0.9, lo: float = 0.01,
                     ) -> tuple:
    """Codebook balancing heuristic (xtts_dvae.py:53-85, ctor default OFF).

    The reference keeps the raw last-64000 emitted indices in a sliding
    buffer and, once full, re-randomizes every code whose usage share is
    > 0.9 or < 0.01 (embed and embed_avg set to the SAME fresh gaussian,
    cluster_size zeroed), then clears the buffer. A dynamic index buffer
    needs dynamic shapes, so the TPU form keeps the equivalent count
    HISTOGRAM and tumbles: accumulate per-step code counts; when the
    window fills, apply the same reset from the histogram shares and
    restart. Statistic and reset rule are identical at window boundaries;
    the only divergence is tumbling vs sliding cadence between them.

    NOTE the reference's thresholds assume a small effective codebook: at
    n_embed=8192 a uniform code is used with share 1/8192 < 0.01, so
    `lo=0.01` re-randomizes nearly everything each window — one reason it
    ships disabled. Faithfully reproduced, equally off by default.

    Returns (new_cb, new_bal, n_reset) — n_reset is 0 on non-boundary
    steps.
    """
    hist = bal.hist + onehot_sum
    total = bal.total + onehot_sum.sum()
    fire = total >= window

    def reset(_):
        h = hist / jnp.maximum(total, 1.0)
        mask = jnp.logical_or(h > hi, h < lo)               # (n,)
        rand = jax.random.normal(key, cb.embed.shape, cb.embed.dtype)
        keep = jnp.where(mask[None, :], 0.0, 1.0)
        embed = cb.embed * keep + rand * (1.0 - keep)
        embed_avg = cb.embed_avg * keep + rand * (1.0 - keep)
        cluster_size = jnp.where(mask, 0.0, cb.cluster_size)
        # tumble: restart the window (the reference clears its buffer only
        # when the mask is non-empty; with lo=0.01 it always is — we
        # restart unconditionally at the boundary, same cadence in practice)
        return (CodebookState(embed, cluster_size, embed_avg),
                BalanceState(jnp.zeros_like(hist), jnp.zeros_like(total)),
                mask.sum(dtype=jnp.int32))

    def accumulate(_):
        return cb, BalanceState(hist, total), jnp.int32(0)

    # cond: the (dim, n_embed) RNG draw + codebook rewrite only runs at
    # window boundaries (~1 in window/batch_codes steps), not every step
    return jax.lax.cond(fire, reset, accumulate, None)


def ema_codebook_update(
    cb: CodebookState,
    onehot_sum: jnp.ndarray,
    embed_sum: jnp.ndarray,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> CodebookState:
    """EMA cluster update (xtts_dvae.py:104-117); psum == the reference's
    all_reduce of (embed_onehot_sum, embed_sum) at :108-110."""
    if axis_name is not None:
        onehot_sum = jax.lax.psum(onehot_sum, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    cluster_size = cb.cluster_size * decay + onehot_sum * (1 - decay)
    embed_avg = cb.embed_avg * decay + embed_sum * (1 - decay)
    n = cluster_size.sum()
    smoothed = (cluster_size + eps) / (n + cluster_size.shape[0] * eps) * n
    embed = embed_avg / smoothed[None, :]
    return CodebookState(embed, cluster_size, embed_avg)


class DVAE(nn.Module):
    """Full model; apply methods select the path.

    API (mirrors xtts_dvae.py):
      encode(mel_bct)       -> pre-VQ logits (B, N, D)
      get_codebook_indices  -> codes (B, N)
      decode(codes)         -> (mel_bct, penult)
      __call__(mel_bct)     -> training fwd: losses + recon + EMA stats
    """

    cfg: DVAEConfig = DVAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = DVAEEncoder(self.cfg, dtype=self.dtype)
        self.decoder = DVAEDecoder(self.cfg, dtype=self.dtype)
        dim, n = self.cfg.codebook_dim, self.cfg.num_tokens
        self._embed = self.variable(
            "codebook", "embed",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (dim, n), jnp.float32),
        )
        self._cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((n,), jnp.float32))
        self._embed_avg = self.variable(
            "codebook", "embed_avg",
            lambda: jnp.array(self._embed.value))  # copy: donation-safe
        if self.cfg.balancing_heuristic:
            # tumbling-window usage histogram for balance_codebook()
            self._bal_hist = self.variable(
                "codebook", "bal_hist", lambda: jnp.zeros((n,), jnp.float32))
            self._bal_total = self.variable(
                "codebook", "bal_total", lambda: jnp.zeros((), jnp.float32))

    def _codebook(self) -> CodebookState:
        return CodebookState(self._embed.value, self._cluster_size.value,
                             self._embed_avg.value)

    def encode(self, mel_bct: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(jnp.swapaxes(mel_bct, 1, 2))

    def get_codebook_indices(self, mel_bct: jnp.ndarray) -> jnp.ndarray:
        logits = self.encode(mel_bct)
        return quantize(logits, self._codebook()).codes

    def decode(self, codes: jnp.ndarray):
        cb = self._codebook()
        # clip: AR stop/start ids (>= num_tokens) may leak into the decode
        # request; torch F.embedding would raise, we saturate instead
        emb = jnp.take(cb.embed.T, codes, axis=0, mode="clip")  # (B, N, D)
        out, penult = self.decoder(emb, return_penult=True)
        return jnp.swapaxes(out, 1, 2), jnp.swapaxes(penult, 1, 2)

    def __call__(self, mel_bct: jnp.ndarray, train: bool = True):
        """Training forward (xtts_dvae.py:366-390): returns
        (recon_loss, ssim_loss, commitment_loss, recon_mel_bct, stats)."""
        logits = self.encode(mel_bct)
        q = quantize(logits, self._codebook())
        dec_in = q.quantized if train else jnp.take(
            self._codebook().embed.T, q.codes, axis=0, mode="clip")
        out = self.decoder(dec_in)                    # (B, T', mel)
        out_bct = jnp.swapaxes(out, 1, 2)[..., : mel_bct.shape[-1]]
        if self.cfg.smooth_l1_loss:
            recon = smooth_l1(mel_bct, out_bct)
        else:
            recon = jnp.mean((mel_bct - out_bct) ** 2)
        ssim_l = jnp.asarray(0.0)
        if self.cfg.ssim_loss_weight > 0:
            ssim_l = (1.0 - ssim(mel_bct[:, None], out_bct[:, None])) * self.cfg.ssim_loss_weight
        return recon, ssim_l, q.commitment_loss, out_bct, (q.onehot_sum, q.embed_sum)


def smooth_l1(a: jnp.ndarray, b: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over (B, 1, H, W) image pairs (ttts/vqvae/ssim.py:1-82),
    separable gaussian filtering as two 1-D convs. Window shrinks (odd) for
    images smaller than 11 px so the VALID conv never empties."""
    window_size = min(window_size, img1.shape[2], img1.shape[3])
    if window_size % 2 == 0:
        window_size -= 1
    img1 = img1.astype(jnp.float32)  # SSIM statistics in f32 for stability
    img2 = img2.astype(jnp.float32)
    g = _gaussian_window(window_size)
    kh = g[None, None, :, None]  # (1,1,K,1)
    kw = g[None, None, None, :]

    def blur(x):
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)
