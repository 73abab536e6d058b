"""AR mel-code generation: the latency-critical decode loop.

TPU-native replacement for HF `generate` (ttts/gpt/model.py:559-591 +
GPT2InferenceModel :36-201): one jitted program = prefill + a
`lax.while_loop` over single-token decode steps against a preallocated
static-shape KV cache, with per-sequence done masking and HF-order sampling
(repetition penalty / temperature / top-p — test.py:113-118 defaults).

Parity quirks preserved:
* the prefix is [conds ; start+text+stop+stop embeddings ; start_mel emb]
  exactly as built by inference_speech (:562-584);
* HF's repetition penalty sees the `fake_inputs` placeholder id 1 and the
  start token, so those ids start out in the penalized set;
* eos == pad == stop_mel_token: finished sequences emit stop tokens.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from xtts_tpu.infer.sampling import greedy_token, sample_token
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.nn.transformer import KVCache


class GenerateResult(NamedTuple):
    codes: jnp.ndarray     # (B, max_gen) int32, stop-padded
    lengths: jnp.ndarray   # (B,) int32 — generated tokens incl. the stop token
    steps: jnp.ndarray     # scalar int32 — decode iterations executed


def ladder_caps(cache_ladder, max_gen: int):
    """Normalize a cache-capacity ladder: sorted unique breakpoints below
    max_gen, always ending at max_gen. None/() -> single monolithic cache."""
    caps = tuple(sorted({int(c) for c in (cache_ladder or ())
                         if 0 < int(c) < max_gen}))
    return caps + (max_gen,)


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_gen", "do_sample", "top_p", "temperature",
                     "repetition_penalty", "typical_mass", "cache_dtype",
                     "cache_ladder"),
)
def generate_speech(
    model: UnifiedVoice,
    variables,
    cond_mel: jnp.ndarray,      # (B, mel_bins, Tc)
    text_tokens: jnp.ndarray,   # (B, Tt) int32
    key: jax.Array,
    max_gen: int = 600,
    do_sample: bool = True,
    top_p: float = 0.8,
    temperature: float = 0.8,
    repetition_penalty: float = 2.0,
    typical_mass: Optional[float] = None,
    cache_dtype=jnp.bfloat16,
    cache_ladder: Optional[tuple] = None,
) -> GenerateResult:
    """cache_ladder: optional generation-capacity breakpoints, e.g.
    (64, 128, 256). The decode then runs as SEGMENTED while_loops in one
    program, each against a cache of capacity prefix+cap — the TPU-shaped
    equivalent of paged KV caches (BASELINE config #5 "KV-cache paging"):
    instead of page tables + gathers (dynamic shapes XLA cannot tile), the
    cache grows through a static ladder, so early decode steps read a much
    smaller K/V buffer. Token-exact vs the monolithic cache: excluded
    positions are masked to exp(-1e9) == 0 exactly, so attention sums are
    unchanged (tests/test_gpt.py). Pays off when cache reads dominate the
    step (large B serving); costs one extra compile + copy per rung."""
    cfg = model.cfg
    stop = cfg.stop_mel_token
    vocab = cfg.number_mel_codes

    prefix, n_cond = model.apply(variables, cond_mel, text_tokens,
                                 method=model.encode_prefix)
    b, p_len, _ = prefix.shape
    caps = ladder_caps(cache_ladder, max_gen)
    hd = cfg.model_dim // cfg.heads
    cache = KVCache.zeros(cfg.layers, b, p_len + caps[0], cfg.heads, hd,
                          dtype=cache_dtype)
    logits0, cache = model.apply(variables, prefix, cache, method=model.prefill)

    # ids HF's repetition penalty has already seen: the fake input id 1 and
    # the start mel token (ttts/gpt/model.py:574-576)
    seen0 = jnp.zeros((b, vocab), bool)
    seen0 = seen0.at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)

    codes0 = jnp.full((b, max_gen), stop, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    lengths0 = jnp.zeros((b,), jnp.int32)

    def body_fn(st):
        step, logits, cache, done, seen, codes, lengths, k = st
        k, sub = jax.random.split(k)
        if do_sample:
            tok = sample_token(sub, logits, temperature=temperature,
                               top_p=top_p, seen=seen,
                               repetition_penalty=repetition_penalty,
                               typical_mass=typical_mass)
        else:
            tok = greedy_token(logits)
        tok = jnp.where(done, stop, tok)
        codes = jax.lax.dynamic_update_slice(codes, tok[:, None], (0, step))
        seen = seen.at[jnp.arange(b), tok].set(True)
        now_done = done | (tok == stop)
        lengths = jnp.where(done, lengths, step + 1)
        # mel position of generated code t: n_cond+1+t under the reference
        # quirk (attention_mask.shape[1] - mel_len, ttts/gpt/model.py:147-149,
        # fake_inputs double-counting conds at :574), t+1 train-consistent.
        mel_pos = step + 1 + (n_cond if cfg.decode_position_quirk else 0)
        logits, cache = model.apply(
            variables, tok, mel_pos, cache, p_len + step,
            method=model.decode_one)
        return (step + 1, logits, cache, now_done, seen, codes, lengths, k)

    state = (jnp.int32(0), logits0, cache, done0, seen0, codes0, lengths0, key)
    for i, cap in enumerate(caps):
        if i:  # grow the cache into the next rung (prefix copy is exact)
            st = list(state)
            old = st[2]
            bigger = KVCache.zeros(cfg.layers, b, p_len + cap, cfg.heads, hd,
                                   dtype=cache_dtype)
            st[2] = KVCache(
                jax.lax.dynamic_update_slice(bigger.k, old.k, (0,) * 5),
                jax.lax.dynamic_update_slice(bigger.v, old.v, (0,) * 5))
            state = tuple(st)

        def cond_fn(st, _cap=cap):
            step, _, _, done, *_ = st
            return (step < _cap) & ~jnp.all(done)

        state = jax.lax.while_loop(cond_fn, body_fn, state)
    step, _, _, done, _, codes, lengths, _ = state
    return GenerateResult(codes, lengths, step)
