"""UnifiedVoice: GPT-2 over [cond ; text ; mel-codes] (TPU re-design of
ttts/gpt/model.py:293-591).

Differences from the reference are purely mechanical, not semantic:
* the HF GPT2Model / GPT2InferenceModel / DeepSpeed trio is one linen stack
  (xtts_tpu/nn/transformer.py) with an explicit static-shape KV cache;
* HF `generate` becomes a `lax.while_loop` decode (xtts_tpu/models/gpt_infer)
  with identical prefix construction (conds + text emb + start mel token,
  ttts/gpt/model.py:559-591) and HF-order sampling;
* mel/text padding-to-stop-token preformatting (set_mel_padding :408-434)
  is vectorised (no Python loops over batch).

Geometry (shipped config ttts/gpt/config.json "gpt"): 15L/1024d/16h,
positions = mel 604+2+1 cond + text 402+2.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.nn.blocks import AttentionBlock, PerceiverResampler
from xtts_tpu.nn.transformer import GPT2Stack, KVCache

Dtype = Any


class ConditioningEncoder(nn.Module):
    """Conv1x1 mel->dim + N AttentionBlocks, first-token pooling
    (ttts/gpt/model.py:204-228)."""

    spec_dim: int
    embedding_dim: int
    attn_blocks: int = 6
    num_heads: int = 4
    mean: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_btc):
        h = nn.Conv(self.embedding_dim, (1,), dtype=self.dtype, name="init")(mel_btc)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_heads,
                               dtype=self.dtype, name=f"attn_{i}")(h)
        return jnp.mean(h, axis=1) if self.mean else h[:, 0]


def _normal_embed(std=0.02):
    return nn.initializers.normal(std)


class UnifiedVoice(nn.Module):
    """scan_stack: run the GPT2 layers as one nn.scan'd block (params in
    the h_scan stacked layout — convert unrolled checkpoints with
    nn.transformer.scan_gpt_variables). Teacher-forced forward only; built
    for the frozen latent-extraction programs whose unrolled bs>=2 compile
    hangs the tunneled chip's remote XLA service (PERF.md round 5)."""

    cfg: GPTConfig = GPTConfig()
    dtype: Dtype = jnp.float32
    scan_stack: bool = False

    def setup(self):
        c = self.cfg
        if c.use_perceiver:
            self.perceiver_encoder = PerceiverResampler(
                c.model_dim, dim_context=c.mel_bins,
                num_latents=c.perceiver_latents, dtype=self.dtype)
        else:
            self.conditioning_encoder = ConditioningEncoder(
                c.mel_bins, c.model_dim, attn_blocks=c.cond_attn_blocks,
                num_heads=c.heads, dtype=self.dtype)
        self.text_embedding = nn.Embed(
            c.number_text_tokens * c.types + 1, c.model_dim,
            embedding_init=_normal_embed())
        self.mel_embedding = nn.Embed(
            c.number_mel_codes, c.model_dim, embedding_init=_normal_embed())
        # segment position embeddings (LearnedPositionEmbeddings, model.py:231-243)
        self.mel_pos_embedding = nn.Embed(
            c.max_mel_positions, c.model_dim, embedding_init=_normal_embed())
        self.text_pos_embedding = nn.Embed(
            c.max_text_positions, c.model_dim, embedding_init=_normal_embed())
        self.gpt = GPT2Stack(c.layers, c.model_dim, c.heads, dtype=self.dtype,
                             remat=c.remat, scan=self.scan_stack)
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name="final_norm")
        self.text_head = nn.Dense(c.number_text_tokens * c.types + 1,
                                  dtype=self.dtype, name="text_head")
        self.mel_head = nn.Dense(c.number_mel_codes, dtype=self.dtype,
                                 name="mel_head")

    # ---------------- conditioning ----------------

    def get_conditioning(self, cond_mel_bct: jnp.ndarray) -> jnp.ndarray:
        """(B, mel, T) or (B, n_clips, mel, T) -> (B, n_cond, dim); n_cond =
        1 (encoder) or 32 (perceiver) — ttts/gpt/model.py:463-476.

        A 4-D input is the multi-voice-sample path (api.py:225-240 stacks
        per-clip conditioning mels on dim 1): each clip runs through the
        encoder and the outputs are averaged (`conds.mean(dim=1)`,
        model.py:473-475). The reference's perceiver branch cannot consume
        stacked clips (its transpose(1,2) assumes 3-D), so we keep that
        restriction explicit."""
        if cond_mel_bct.ndim == 4:
            if self.cfg.use_perceiver:
                raise ValueError(
                    "multi-clip conditioning requires the plain conditioning "
                    "encoder (the reference perceiver path only accepts one "
                    "clip, ttts/gpt/model.py:463-470)")
            b, n, c, t = cond_mel_bct.shape
            x = jnp.swapaxes(cond_mel_bct.reshape(b * n, c, t), 1, 2)
            enc = self.conditioning_encoder(x).reshape(b, n, -1)
            return jnp.mean(enc, axis=1)[:, None, :]
        x = jnp.swapaxes(cond_mel_bct, 1, 2)
        if self.cfg.use_perceiver:
            return self.perceiver_encoder(x)
        return self.conditioning_encoder(x)[:, None, :]

    # ---------------- training forward ----------------

    @staticmethod
    def _set_padding(tokens: jnp.ndarray, lengths: jnp.ndarray, fill: int):
        """Replace positions >= length with `fill` (set_mel_padding,
        ttts/gpt/model.py:408-434, vectorised)."""
        pos = jnp.arange(tokens.shape[1])[None, :]
        return jnp.where(pos < lengths[:, None], tokens, fill)

    @staticmethod
    def _build_aligned(tokens: jnp.ndarray, start: int, stop: int):
        """inp = [start; x], tar = [x; stop] (ttts/gpt/model.py:403-406)."""
        inp = jnp.pad(tokens, ((0, 0), (1, 0)), constant_values=start)
        tar = jnp.pad(tokens, ((0, 0), (0, 1)), constant_values=stop)
        return inp, tar

    def __call__(
        self,
        cond_mel: jnp.ndarray,      # (B, mel, Tc)
        text_inputs: jnp.ndarray,   # (B, Tt) int
        text_lengths: jnp.ndarray,  # (B,)
        mel_codes: jnp.ndarray,     # (B, Tm) int
        wav_lengths: jnp.ndarray,   # (B,)
        return_latent: bool = False,
        return_logits: bool = False,
    ):
        """Teacher-forced forward (ttts/gpt/model.py:478-557).

        Returns (loss_text, loss_mel, mel_logits) or latents when
        `return_latent` (the hidden states feeding the diffusion decoder,
        final two positions stripped)."""
        c = self.cfg
        # Capacity guards (trace-time, static shapes, zero runtime cost):
        # the learned position tables are sized max_*_tokens+2
        # (ttts/gpt/model.py:345-348). Longer inputs would gather OOB,
        # which under jit silently fills NaN instead of raising — turn it
        # into a loud error here.
        if text_inputs.shape[1] > c.max_text_tokens:
            raise ValueError(
                f"text length {text_inputs.shape[1]} exceeds "
                f"GPTConfig.max_text_tokens={c.max_text_tokens}; the text "
                f"position table would index out of bounds (silent NaNs "
                f"under jit). Cap the dataset/bucket lengths to the config.")
        if mel_codes.shape[1] > c.max_mel_tokens:
            raise ValueError(
                f"mel-code length {mel_codes.shape[1]} exceeds "
                f"GPTConfig.max_mel_tokens={c.max_mel_tokens}; the mel "
                f"position table would index out of bounds (silent NaNs "
                f"under jit). Cap mel frames at 4*max_mel_tokens.")
        conds = self.get_conditioning(cond_mel)

        mel_code_lengths = jnp.ceil(
            wav_lengths / c.mel_length_compression).astype(jnp.int32) + 1
        mel_codes = self._set_padding(mel_codes, mel_code_lengths, c.stop_mel_token)
        text_inputs = self._set_padding(text_inputs, text_lengths, c.stop_text_token)

        text_inputs = jnp.pad(text_inputs, ((0, 0), (0, 1)),
                              constant_values=c.stop_text_token)
        mel_codes = jnp.pad(mel_codes, ((0, 0), (0, 1)),
                            constant_values=c.stop_mel_token)

        text_inp, text_tar = self._build_aligned(
            text_inputs, c.start_text_token, c.stop_text_token)
        mel_inp, mel_tar = self._build_aligned(
            mel_codes, c.start_mel_token, c.stop_mel_token)

        text_emb = (self.text_embedding(text_inp)
                    + self.text_pos_embedding(jnp.arange(text_inp.shape[1])))
        mel_emb = (self.mel_embedding(mel_inp)
                   + self.mel_pos_embedding(jnp.arange(mel_inp.shape[1])))

        emb = jnp.concatenate([conds.astype(text_emb.dtype), text_emb, mel_emb],
                              axis=1)
        _, normed = self.gpt(emb)
        # get_logits drops exactly ONE leading position no matter how many
        # conditioning slots there are ("The first logit is tied to the
        # speech_conditioning_input", ttts/gpt/model.py:445). With the plain
        # encoder (n_cond=1) that strips the cond slot; with the perceiver
        # (n_cond=32) the text slice below lands on 31 conditioning positions
        # — a reference quirk its trained checkpoints embed, reproduced for
        # parity. Mel logits/latents are sliced from the END, so they are
        # correctly aligned in both modes.
        enc = self.final_norm(normed[:, 1:]).astype(emb.dtype)

        t_text = text_inp.shape[1]
        t_mel = mel_inp.shape[1]
        text_latent = enc[:, :t_text]
        mel_latent = enc[:, -t_mel:]

        if return_latent:
            return mel_latent[:, :-2]  # strip the 2 tokens this fwd added (:538)

        text_logits = self.text_head(text_latent)
        mel_logits = self.mel_head(mel_latent)

        # targets[l+1:] = -1 (ttts/gpt/model.py:545-549): valid pos <= length,
        # i.e. all real tokens plus exactly one stop token
        pos_t = jnp.arange(t_text)[None, :]
        text_mask = pos_t <= text_lengths[:, None]
        pos_m = jnp.arange(t_mel)[None, :]
        mel_mask = pos_m <= mel_code_lengths[:, None]

        loss_text = masked_ce(text_logits, text_tar, text_mask)
        loss_mel = masked_ce(mel_logits, mel_tar, mel_mask)
        if return_logits:
            return loss_text, loss_mel, mel_logits
        return loss_text, loss_mel

    # ---------------- inference building blocks ----------------

    def encode_prefix(self, cond_mel: jnp.ndarray, text_inputs: jnp.ndarray):
        """Build the generation prefix embedding (inference_speech,
        ttts/gpt/model.py:559-584): conds + [start; text; stop; stop] text
        embedding + trailing start-mel embedding at mel position 0.

        text_inputs here = caller-prepared tokens (test.py:131-136 adds its own
        0/1 framing); we add the stop pad + start/stop alignment like :562-563.
        Returns (prefix_emb, n_cond)."""
        c = self.cfg
        if text_inputs.shape[1] > c.max_text_tokens:
            raise ValueError(
                f"text length {text_inputs.shape[1]} exceeds "
                f"GPTConfig.max_text_tokens={c.max_text_tokens}: the text "
                f"position table (max_text_tokens+2) would gather OOB — "
                f"silent NaNs under jit. Split or truncate the sentence "
                f"(tts() does this automatically).")
        text_inputs = jnp.pad(text_inputs, ((0, 0), (0, 1)),
                              constant_values=c.stop_text_token)
        text_inp, _ = self._build_aligned(text_inputs, c.start_text_token,
                                          c.stop_text_token)
        text_emb = (self.text_embedding(text_inp)
                    + self.text_pos_embedding(jnp.arange(text_inp.shape[1])))
        conds = self.get_conditioning(cond_mel).astype(text_emb.dtype)
        b = text_inputs.shape[0]
        # Reference fake_inputs quirk (ttts/gpt/model.py:574-584): the
        # placeholder is conds.shape[1] + emb.shape[1] long, so the first
        # GPT2InferenceModel.forward embeds n_cond trailing *tokens* — ids
        # [1]*(n_cond-1) + [start_mel] at mel positions 0..n_cond-1
        # (model.py:133-143). With the plain conditioning encoder n_cond=1
        # and the tail is just the start token at position 0; the perceiver
        # (n_cond=32) additionally embeds 31 mel-code-1 fillers. Reproduced
        # exactly under decode_position_quirk for token parity.
        n_tail = conds.shape[1] if c.decode_position_quirk else 1
        tail = jnp.concatenate(
            [jnp.full((b, n_tail - 1), 1, jnp.int32),
             jnp.full((b, 1), c.start_mel_token, jnp.int32)], axis=1)
        tail_emb = (self.mel_embedding(tail)
                    + self.mel_pos_embedding(jnp.arange(n_tail))[None])
        prefix = jnp.concatenate([conds, text_emb,
                                  tail_emb.astype(text_emb.dtype)], axis=1)
        return prefix, conds.shape[1]

    def prefill(self, prefix_emb: jnp.ndarray, cache: KVCache,
                prefix_mask: Optional[jnp.ndarray] = None):
        """Seed the KV cache with the prefix; return logits for the first
        mel code and the updated cache."""
        _, normed, cache = self.gpt.prefill(prefix_emb, cache, prefix_mask)
        last = normed[:, -1:]
        logits = self.mel_head(self.final_norm(last).astype(last.dtype))
        return logits[:, 0], cache

    def decode_one(self, token: jnp.ndarray, mel_pos: jnp.ndarray,
                   cache: KVCache, index: jnp.ndarray,
                   valid_mask: Optional[jnp.ndarray] = None):
        """One AR step: embed `token` (B,) at mel position `mel_pos`, attend
        to cache up to absolute `index`, return (logits (B,V), cache)."""
        pos_emb = self.mel_pos_embedding(jnp.atleast_1d(mel_pos))  # (1, dim)
        emb = self.mel_embedding(token[:, None]) + pos_emb[None, :, :]
        normed, cache = self.gpt.decode_step(emb.astype(self.dtype), cache, index)
        logits = self.mel_head(self.final_norm(normed).astype(normed.dtype))
        return logits[:, 0], cache

    def latent_dim(self) -> int:
        return self.cfg.model_dim


def masked_ce(logits: jnp.ndarray, targets: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy with ignore mask (mean over valid positions), matching
    F.cross_entropy(ignore_index=-1)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
