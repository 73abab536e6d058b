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
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(self.channels)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME", dtype=self.dtype)(h)
        h = GroupNorm32(self.channels)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(h)
        return x + h


class AudioMiniEncoder(nn.Module):
    """Mel (B, T, spec_dim) -> (B, embedding_dim) pooled embedding."""

    spec_dim: int = 100
    embedding_dim: int = 512
    base_channels: int = 32
    depth: int = 5
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = nn.Conv(self.base_channels, (3,), padding="SAME",
                    dtype=self.dtype, name="init")(mel)
        ch = self.base_channels
        for d in range(self.depth):
            for r in range(self.resnet_blocks):
                x = _ResBlock(ch, dtype=self.dtype, name=f"res_{d}_{r}")(x)
            out_ch = min(ch * 2, self.embedding_dim)
            x = nn.Conv(out_ch, (3,), strides=(2,), padding="SAME",
                        dtype=self.dtype, name=f"down_{d}")(x)
            ch = out_ch
        x = nn.Conv(self.embedding_dim, (1,), dtype=self.dtype, name="final")(x)
        for a in range(self.attn_blocks):
            x = AttentionBlock(self.embedding_dim, self.num_attn_heads,
                               dtype=self.dtype, name=f"attn_{a}")(x)
        # take the first token as the summary (ttts/utils/utils.py:524 h[:,:,0])
        return x[:, 0]


class AudioClassifier(nn.Module):
    """AudioMiniEncoder + linear class head (ttts/classifier/model.py:64-151)."""

    cfg: ClassifierConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, spec_dim) channels-last. Returns (B, classes) logits."""
        c = self.cfg
        h = AudioMiniEncoder(
            spec_dim=c.spec_dim, embedding_dim=c.base_channels * 16,
            base_channels=c.base_channels, depth=c.depth,
            resnet_blocks=c.resnet_blocks, attn_blocks=c.attn_blocks,
            num_attn_heads=c.num_attn_heads, dtype=self.dtype,
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
    """Softmax CE loss closure for the generic Trainer."""
    import jax

    def loss_fn(params, batch, rng):
        logits = model.apply({"params": params}, batch["mel"])
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, batch["label"][:, None], axis=-1)
        loss = nll.mean()
        acc = (logits.argmax(-1) == batch["label"]).mean()
        return loss, {"loss": loss, "acc": acc}

    return loss_fn
