"""Audio quality (clean/noise) mel classifier.

Reference: ttts/classifier/model.py:64-151 AudioMiniEncoderWithClassifierHead
(conv downsample pyramid + attention stack + linear head), used offline to
filter noisy crawled clips (ttts/prepare/filter_noise.py:21-25).

TPU design: channels-last 1-D convs (MXU-friendly), GroupNorm32 + the
reference's attention block, one jitted forward; batch scoring of cached mels
is a single vmap-free call since the stack is already batched.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.core.config import ClassifierConfig
from xtts_tpu.nn.blocks import AttentionBlock, GroupNorm32

Dtype = Any


class _ResBlock(nn.Module):
    """norm/SiLU/conv + norm/SiLU/dropout/zero-conv residual
    (ttts/classifier/model.py:10-79; kernel_size 5 in the shipped config)."""

    channels: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        h = GroupNorm32(self.channels)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (self.kernel_size,), padding=pad,
                    dtype=self.dtype, name="in_conv")(h)
        h = GroupNorm32(self.channels, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (self.kernel_size,), padding=pad,
                    dtype=self.dtype, kernel_init=nn.initializers.zeros,
                    name="out_conv")(h)
        return x + h


class AudioMiniEncoder(nn.Module):
    """Mel (B, T, spec_dim) -> (B, embedding_dim) pooled embedding
    (ttts/classifier/model.py:81-124): init conv3, depth x (resnet blocks +
    k5/stride-factor downsample conv doubling channels), norm/SiLU/1x1 to
    embedding_dim, attention stack, first-token summary."""

    spec_dim: int = 100
    embedding_dim: int = 512
    base_channels: int = 32
    depth: int = 5
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    downsample_factor: int = 4
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = nn.Conv(self.base_channels, (3,), padding=1,
                    dtype=self.dtype, name="init")(mel)
        ch = self.base_channels
        for d in range(self.depth):
            for r in range(self.resnet_blocks):
                x = _ResBlock(ch, self.kernel_size, dtype=self.dtype,
                              name=f"res_{d}_{r}")(x)
            # Downsample(use_conv=True): k5 stride=factor pad=2
            # (ttts/utils/utils.py:344-369)
            x = nn.Conv(ch * 2, (5,), strides=(self.downsample_factor,),
                        padding=2, dtype=self.dtype, name=f"down_{d}")(x)
            ch *= 2
        x = GroupNorm32(ch, name="final_norm")(x)
        x = nn.silu(x)
        x = nn.Conv(self.embedding_dim, (1,), dtype=self.dtype,
                    name="final")(x)
        for a in range(self.attn_blocks):
            x = AttentionBlock(self.embedding_dim, self.num_attn_heads,
                               dtype=self.dtype, name=f"attn_{a}")(x)
        # take the first token as the summary (classifier/model.py:124)
        return x[:, 0]


class AudioClassifier(nn.Module):
    """AudioMiniEncoder + linear class head (ttts/classifier/model.py:126-151)."""

    cfg: ClassifierConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, spec_dim) channels-last. Returns (B, classes) logits."""
        c = self.cfg
        h = AudioMiniEncoder(
            spec_dim=c.spec_dim, embedding_dim=c.embedding_dim,
            base_channels=c.base_channels, depth=c.depth,
            resnet_blocks=c.resnet_blocks, attn_blocks=c.attn_blocks,
            num_attn_heads=c.num_attn_heads,
            downsample_factor=c.downsample_factor,
            kernel_size=c.kernel_size, dtype=self.dtype,
            name="encoder")(mel)
        return nn.Dense(c.classes, dtype=jnp.float32, name="head")(h)


def make_noise_scorer(model: AudioClassifier, variables,
                      crop_frames: int = 200):
    """Batch noise-probability scorer over cached mels — the inference side
    of the dataset filter (ttts/classifier/infer.py:26-67 scores `.mel.pth`
    files; pair with xtts_tpu.data.prepare.filter_noise)."""
    import jax

    @jax.jit
    def _score(mel_btc):
        logits = model.apply(variables, mel_btc)
        return jax.nn.softmax(logits, axis=-1)[:, 1]   # P(noise)

    def score_fn(mel: "np.ndarray") -> float:
        import numpy as np
        mel = np.asarray(mel, np.float32)
        if mel.shape[-1] < crop_frames:
            mel = np.pad(mel, ((0, 0), (0, crop_frames - mel.shape[-1])))
        mel = mel[:, :crop_frames]
        return float(_score(mel.T[None])[0])           # (1, T, bins)

    return score_fn


def make_classifier_loss(model: AudioClassifier):
    """Softmax CE loss closure for the generic Trainer.

    With cfg.distribute_zero_label, 20% of the probability mass of
    label-0 ("clean") targets is spread over the other classes to absorb
    dataset noise (ttts/classifier/model.py:138-148)."""
    import jax

    def loss_fn(params, state_cols, batch, rng):
        logits = model.apply({"params": params}, batch["mel"])
        labels = batch["label"]
        n = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        if model.cfg.distribute_zero_label:
            oh = jax.nn.one_hot(labels, n)
            extra = jnp.full((n,), 0.2 / (n - 1)).at[0].set(-0.2)
            oh = oh + extra[None, :] * (labels == 0)[:, None]
            loss = -(oh * logp).sum(-1).mean()
        else:
            loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, {"loss": loss, "acc": acc}

    return loss_fn
