"""CLVP — contrastive text/speech-code reranker.

Reference: ttts/clvp/model.py:19-140. Two encoder towers (text BPE tokens,
mel-VQ codes) -> masked-mean pooled latents -> temperature-scaled cosine
logits; symmetric cross-entropy for training, row softmax for reranking AR
candidates at inference (ttts/api.py:397-460 picks top-k by CLVP score).

TPU design: both towers are plain jitted encoder stacks (xtts_tpu.nn.encoder)
sharing one linen module; reranking scores a whole candidate batch in a
single forward, which is the batched-serving path of BASELINE config #5.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.core.config import CLVPConfig
from xtts_tpu.nn.encoder import TortoiseEncoder, TransformerEncoder, masked_mean

Dtype = Any


class CLVP(nn.Module):
    cfg: CLVPConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.text_emb = nn.Embed(c.num_text_tokens, c.dim_text,
                                 dtype=self.dtype)
        self.speech_emb = nn.Embed(c.num_speech_tokens, c.dim_speech,
                                   dtype=self.dtype)
        if c.use_xformers:
            # the rotary/RMSNorm x-transformers variant (use_xformers=True,
            # ttts/clvp/model.py:53-84)
            self.text_enc = TransformerEncoder(
                depth=c.text_enc_depth, dim=c.dim_text, heads=c.text_heads,
                dtype=self.dtype, name="text_transformer")
            self.speech_enc = TransformerEncoder(
                depth=c.speech_enc_depth, dim=c.dim_speech,
                heads=c.speech_heads, dtype=self.dtype,
                name="speech_transformer")
        else:
            # LIVE default: tortoise Transformer with learned abs positions
            # (ttts/clvp/model.py:86-98); note the reference sizes the
            # speech pos table by num_speech_tokens, not seq_len (:98)
            self.text_enc = TortoiseEncoder(
                depth=c.text_enc_depth, dim=c.dim_text, heads=c.text_heads,
                dtype=self.dtype, name="text_transformer")
            self.speech_enc = TortoiseEncoder(
                depth=c.speech_enc_depth, dim=c.dim_speech,
                heads=c.speech_heads, dtype=self.dtype,
                name="speech_transformer")
            self.text_pos_emb = nn.Embed(c.text_seq_len, c.dim_text,
                                         dtype=self.dtype)
            self.speech_pos_emb = nn.Embed(c.num_speech_tokens, c.dim_speech,
                                           dtype=self.dtype)
        self.to_text_latent = nn.Dense(c.dim_latent, use_bias=False,
                                       dtype=self.dtype)
        self.to_speech_latent = nn.Dense(c.dim_latent, use_bias=False,
                                         dtype=self.dtype)
        # log temperature (ttts/clvp/model.py:117 temperature param)
        self.temperature = self.param("temperature",
                                      nn.initializers.ones, (1,))

    def embed_text(self, text: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = self.text_emb(text)
        if not self.cfg.use_xformers:
            if text.shape[1] > self.cfg.text_seq_len:
                raise ValueError(
                    f"text length {text.shape[1]} exceeds CLVP "
                    f"text_seq_len={self.cfg.text_seq_len} (position table "
                    f"OOB — silent NaNs under jit)")
            h = h + self.text_pos_emb(jnp.arange(text.shape[1]))
        h = self.text_enc(h, mask)
        lat = self.to_text_latent(masked_mean(h, mask))
        return lat / jnp.linalg.norm(lat, axis=-1, keepdims=True)

    def embed_speech(self, codes: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = self.speech_emb(codes)
        if not self.cfg.use_xformers:
            # reference quirk kept: the speech POSITION table is sized by
            # num_speech_tokens, not a seq_len (ttts/clvp/model.py:98) —
            # harmless at the live config (8192 >> 430 codes) but a real
            # capacity bound for small configs, so guard it loudly.
            if codes.shape[1] > self.cfg.num_speech_tokens:
                raise ValueError(
                    f"code length {codes.shape[1]} exceeds the CLVP speech "
                    f"position table (sized num_speech_tokens="
                    f"{self.cfg.num_speech_tokens}, ttts/clvp/model.py:98 "
                    f"quirk) — OOB gathers are silent NaNs under jit")
            h = h + self.speech_pos_emb(jnp.arange(codes.shape[1]))
        h = self.speech_enc(h, mask)
        lat = self.to_speech_latent(masked_mean(h, mask))
        return lat / jnp.linalg.norm(lat, axis=-1, keepdims=True)

    def __call__(self, text: jnp.ndarray, codes: jnp.ndarray,
                 text_mask: Optional[jnp.ndarray] = None,
                 code_mask: Optional[jnp.ndarray] = None,
                 return_loss: bool = False):
        """Similarity logits (B, B) scaled by learned temperature; with
        return_loss, the symmetric InfoNCE loss (ttts/clvp/model.py:133-140)."""
        tl = self.embed_text(text, text_mask)
        sl = self.embed_speech(codes, code_mask)
        temp = jnp.exp(self.temperature)
        logits = jnp.einsum("id,jd->ij", tl, sl) * temp
        if not return_loss:
            return logits
        n = logits.shape[0]
        labels = jnp.arange(n)
        loss_t = _ce(logits, labels)
        loss_s = _ce(logits.T, labels)
        return (loss_t + loss_s) / 2

    def rerank(self, text: jnp.ndarray, candidate_codes: jnp.ndarray,
               code_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Score K speech-code candidates against one text.

        text: (T,) int32; candidate_codes: (K, S). Returns (K,) scores —
        the inference-time use (ttts/api.py:404: clvp(text_repeated, codes)).
        """
        tl = self.embed_text(text[None])  # (1, D)
        sl = self.embed_speech(candidate_codes, code_mask)  # (K, D)
        return (sl @ tl[0]) * jnp.exp(self.temperature)[0]

    def rerank_batch(self, texts: jnp.ndarray, candidate_codes: jnp.ndarray,
                     text_mask: Optional[jnp.ndarray] = None,
                     code_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Score K candidates for EACH of B texts in one program (the
        batched-serving analogue of ttts/api.py:397-412, where tortoise
        scores num_autoregressive_samples candidates per utterance).

        texts: (B, T); candidate_codes: (B, K, S); code_mask: (B, K, S).
        Returns (B, K) scores."""
        b, k, s = candidate_codes.shape
        tl = self.embed_text(texts, text_mask)                    # (B, D)
        sl = self.embed_speech(
            candidate_codes.reshape(b * k, s),
            None if code_mask is None else code_mask.reshape(b * k, s))
        sl = sl.reshape(b, k, -1)
        return jnp.einsum("bkd,bd->bk", sl, tl) * jnp.exp(self.temperature)[0]


def _ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def make_clvp_loss(model: CLVP):
    """Loss closure for the generic Trainer (xtts_tpu/train/trainer.py)."""

    def loss_fn(params, state_cols, batch, rng):
        loss = model.apply({"params": params}, batch["text"], batch["codes"],
                           batch.get("text_mask"), batch.get("code_mask"),
                           return_loss=True)
        return loss, {"loss": loss}

    return loss_fn
