"""Compacting decode waves: continuous-batching-lite for batched serving.

The batched AR program exits only when ALL rows are done (the while_loop
condition in gpt_infer.generate_speech), so at serving batch sizes every
finished row keeps paying full cache reads until the slowest row stops —
and the AR step is ~94% cache-read traffic at B>=16 (PERF.md), so the done
tail is pure waste. True per-row refill (vLLM-style continuous batching)
would need per-row positions and per-row cache write offsets — scatter-
shaped memory ops XLA cannot tile well. The TPU-shaped alternative here:
run the decode as SEGMENTS (the cache-ladder rungs), sync the tiny (B,)
done mask between segments (~20 ms tunnel RTT vs multi-second waves), drop
finished rows, and continue the live rows at a smaller static row bucket.

Exactness: row math is independent, and the per-step RNG split sequence is
preserved across segment boundaries, so with NO row drop the result is
bit-identical to the monolithic program (greedy and sampled). After a drop
the shared-key categorical draw's shape changes, so sampled tokens can
differ from the monolithic program — the same tolerance class as
batch-count bucketing (serving.synthesize_batch); greedy decode stays
token-exact throughout. per_row_keys=True switches to slot-serving's
per-row chains (sampling.sample_token_rows): sampled tokens then become
INVARIANT to drops (pure per-row functions), at the cost of no longer
matching the shared-key monolithic draw.

No reference counterpart: the reference generates at fixed batch via HF
`generate` (ttts/gpt/model.py:588). Engines covered: the bf16 flax chain
and the int8 XLA chain (+ int8 KV cache); the fused Pallas kernels keep
their own fixed-B programs and are gated off under compaction.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.infer.sampling import greedy_token, sample_token
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.models.gpt_infer import GenerateResult, ladder_caps
from xtts_tpu.nn.transformer import KVCache
from xtts_tpu.infer.qdecode import _decode_logits, quantize_kv


def default_rungs(max_gen: int) -> Tuple[int, ...]:
    """Segment boundaries when no cache_ladder is configured: power-of-two
    rungs from 64 up, so compaction checks run on a doubling schedule (and
    early segments get the smaller-cache ladder benefit for free)."""
    rungs, c = [], 64
    while c < max_gen:
        rungs.append(c)
        c *= 2
    return tuple(rungs)


@functools.partial(jax.jit, static_argnames=("model", "max_gen", "cap0",
                                             "cache_dtype", "quantize"))
def _init_state(model: UnifiedVoice, variables, cond_mel, text_tokens, key,
                max_gen: int, cap0: int, cache_dtype, quantize: bool):
    """Prefill into a cache of capacity prefix+cap0 and build the decode
    state tuple shared by both engines:
    (step, logits f32, cache, done, seen, codes, lengths, key)."""
    cfg = model.cfg
    prefix, _ = model.apply(variables, cond_mel, text_tokens,
                            method=model.encode_prefix)
    b, p_len, _ = prefix.shape
    cache = KVCache.zeros(cfg.layers, b, p_len + cap0, cfg.heads,
                          cfg.model_dim // cfg.heads, dtype=cache_dtype)
    logits0, cache = model.apply(variables, prefix, cache,
                                 method=model.prefill)
    if quantize:
        cache = quantize_kv(cache)
    vocab = cfg.number_mel_codes
    seen0 = jnp.zeros((b, vocab), bool)
    seen0 = seen0.at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
    codes0 = jnp.full((b, max_gen), cfg.stop_mel_token, jnp.int32)
    return (jnp.int32(0), logits0.astype(jnp.float32), cache,
            jnp.zeros((b,), bool), seen0, codes0,
            jnp.zeros((b,), jnp.int32), key)


@functools.partial(jax.jit, static_argnames=(
    "model", "cap", "p_len", "n_cond", "do_sample", "top_p", "temperature",
    "repetition_penalty", "typical_mass"), donate_argnames=("state",))
def _run_segment(model: UnifiedVoice, variables, qtree, state, cap: int,
                 p_len: int, n_cond: int, do_sample: bool, top_p: float,
                 temperature: float, repetition_penalty: float,
                 typical_mass: Optional[float]):
    """Decode until step == cap (or all rows done) against a cache grown to
    prefix+cap. Body numerics mirror gpt_infer.generate_speech (flax chain,
    qtree=None) / qdecode.generate_speech_quantized (int8 chain); sampling
    casts to f32 first in both, so sharing one f32 logits carrier keeps
    token parity with either monolithic program."""
    cfg = model.cfg
    stop = cfg.stop_mel_token
    b = state[3].shape[0]

    cache = state[2]
    target = p_len + cap
    if cache.k.shape[2] < target:
        def grow(a):  # zero-pad is exact: positions past `index` are masked
            pad = [(0, 0)] * a.ndim
            pad[2] = (0, target - a.shape[2])
            return jnp.pad(a, pad)
        state = state[:2] + (type(cache)(*(grow(a) for a in cache)),
                             ) + state[3:]

    def body_fn(st):
        step, logits, cache, done, seen, codes, lengths, k = st
        if k.ndim == 2:
            # per-row chains (per_row_keys=True): row i's draws depend only
            # on its own key, so sampled tokens are invariant to drops
            splits = jax.vmap(jax.random.split)(k)
            k, sub = splits[:, 0], splits[:, 1]
        else:
            k, sub = jax.random.split(k)
        if do_sample:
            if sub.ndim == 2:
                from xtts_tpu.infer.sampling import sample_token_rows
                tok = sample_token_rows(sub, logits, temperature=temperature,
                                        top_p=top_p, seen=seen,
                                        repetition_penalty=repetition_penalty,
                                        typical_mass=typical_mass)
            else:
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
        # same mel-position convention as the monolithic engines (reference
        # quirk at ttts/gpt/model.py:147-149)
        mel_pos = step + 1 + (n_cond if cfg.decode_position_quirk else 0)
        if qtree is not None:
            logits, cache = _decode_logits(qtree, cfg.heads, tok, mel_pos,
                                           cache, p_len + step)
        else:
            logits, cache = model.apply(variables, tok, mel_pos, cache,
                                        p_len + step, method=model.decode_one)
        return (step + 1, logits.astype(jnp.float32), cache, now_done, seen,
                codes, lengths, k)

    def cond_fn(st):
        step, _, _, done, *_ = st
        return (step < cap) & ~jnp.all(done)

    return jax.lax.while_loop(cond_fn, body_fn, state)


@functools.partial(jax.jit, donate_argnames=("state",))
def _take_rows(state, idx):
    """Gather decode-state rows (cache batch axis is 1, the rest 0; step is
    a shared scalar; key is shared unless per-row (B, 2) chains ride in)."""
    step, logits, cache, done, seen, codes, lengths, key = state
    t0 = lambda a: jnp.take(a, idx, axis=0)
    cache = type(cache)(*(jnp.take(a, idx, axis=1) for a in cache))
    return (step, t0(logits), cache, t0(done), t0(seen), t0(codes),
            t0(lengths), key if key.ndim == 1 else t0(key))


def generate_speech_compacting(
    model: UnifiedVoice,
    variables,
    qtree: Optional[Dict[str, Any]],
    cond_mel: jnp.ndarray,
    text_tokens: jnp.ndarray,
    key: jax.Array,
    max_gen: int = 600,
    do_sample: bool = True,
    top_p: float = 0.8,
    temperature: float = 0.8,
    repetition_penalty: float = 2.0,
    typical_mass: Optional[float] = None,
    cache_dtype=jnp.bfloat16,
    quantize_kv_cache: bool = False,
    cache_ladder: Optional[tuple] = None,
    row_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32),
    per_row_keys: bool = False,
) -> GenerateResult:
    """generate_speech with row compaction at segment boundaries.

    qtree=None runs the bf16 flax chain; a quantized tree runs the int8 XLA
    chain (qdecode semantics; quantize_kv_cache stores K/V int8).
    cache_ladder supplies the segment boundaries (default: power-of-two
    rungs from 64); row_buckets are the static batch sizes the wave may
    shrink through — each (rows, rung) pair compiles one program, so keep
    the set small and warm it up for serving (BatchServer.warmup).

    per_row_keys: row i samples from its own chain fold_in(key, i) (as in
    slot serving), making sampled tokens INVARIANT to drops/compaction —
    the draw no longer depends on the live batch's shape. Default False
    preserves the monolithic programs' shared-key draw sequence (sampled
    output bit-identical to generate_speech when nothing drops).

    Returns codes/lengths in the ORIGINAL row order. `steps` counts decode
    iterations of the longest-lived row (the wave's critical path)."""
    cfg = model.cfg
    if quantize_kv_cache and qtree is None:
        raise ValueError("quantize_kv_cache needs the quantized engine "
                         "(pass the qtree)")
    text_tokens = jnp.asarray(text_tokens, jnp.int32)
    b0 = text_tokens.shape[0]
    if per_row_keys:
        key = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b0))
    caps = ladder_caps(cache_ladder or default_rungs(max_gen), max_gen)
    n_cond = cfg.perceiver_latents if cfg.use_perceiver else 1
    state = _init_state(model, variables, cond_mel, text_tokens, key,
                        max_gen=max_gen, cap0=caps[0],
                        cache_dtype=cache_dtype,
                        quantize=bool(qtree is not None and quantize_kv_cache))
    p_len = int(state[2].k.shape[2]) - caps[0]   # cache = prefix + cap0

    buckets = tuple(sorted({int(r) for r in row_buckets if int(r) > 0}))
    orig = np.arange(b0)                 # original index of each live row
    out_codes = np.full((b0, max_gen), cfg.stop_mel_token, np.int32)
    out_lengths = np.zeros((b0,), np.int32)

    for i, cap in enumerate(caps):
        state = _run_segment(model, variables, qtree, state, cap=cap,
                             p_len=p_len, n_cond=n_cond, do_sample=do_sample,
                             top_p=top_p, temperature=temperature,
                             repetition_penalty=repetition_penalty,
                             typical_mass=typical_mass)
        if i == len(caps) - 1:
            break
        done = np.asarray(state[3])                     # tiny host sync
        live = np.flatnonzero(~done)
        if live.size == 0:
            break
        b_cur = done.shape[0]
        b_new = next((r for r in buckets if r >= live.size), b_cur)
        if b_new >= b_cur:
            continue
        # retire finished rows (their codes are final: done rows only ever
        # rewrite stop over the stop-initialized buffer)
        codes_h = np.asarray(state[5])
        lengths_h = np.asarray(state[6])
        drop = np.flatnonzero(done)
        out_codes[orig[drop]] = codes_h[drop]
        out_lengths[orig[drop]] = lengths_h[drop]
        # pad the bucket with already-done rows; they stay done (emit stop)
        keep = np.concatenate([live, drop[:b_new - live.size]])
        orig = orig[keep]
        state = _take_rows(state, jnp.asarray(keep, jnp.int32))

    codes_h = np.asarray(state[5])
    lengths_h = np.asarray(state[6])
    out_codes[orig] = codes_h
    out_lengths[orig] = lengths_h
    return GenerateResult(jnp.asarray(out_codes), jnp.asarray(out_lengths),
                          state[0])
