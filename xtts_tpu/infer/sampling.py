"""Token sampling ops for the AR decode loop.

Reimplements the HF logits-processor semantics the reference relies on
(ttts/gpt/model.py:586-590 with test.py:113-118 knobs) as pure jnp functions
usable inside `lax.scan` / `lax.while_loop`:

* repetition penalty 2.0 — divide positive / multiply negative logits of
  every token id already seen in `input_ids` (HF RepetitionPenaltyLogitsProcessor)
* temperature warp
* top-p (nucleus) keeping the first token that crosses the threshold
  (HF TopPLogitsWarper, min_tokens_to_keep=1)
* typical sampling (ttts/utils/typical_sampling.py:5-32)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite "filter" value; matches HF float("-inf") semantics


def apply_repetition_penalty(logits: jnp.ndarray, seen: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """logits (B, V); seen (B, V) bool — ids present in the sequence so far."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Mask tokens outside the nucleus to NEG_INF. Keeps the token that
    crosses the cumulative threshold (HF convention), extended to all ties
    of the boundary logit, and always >= 1 token.

    Implemented as a binary search for the boundary logit value rather
    than a descending sort + cumsum: the nucleus is exactly
    {v : mass(logits > v) < top_p} extended by ties, so 40 masked-sum
    passes find the same boundary a full-vocab bitonic sort (~170 array
    passes for the 8194-wide mel vocab) + prefix scan would. Sampling ops
    were +0.13 ms of the 0.57 ms/step live decode with the sort
    (PERF.md round 3). Float-rounding of the mass sums can move the
    boundary by a token relative to the sorted-cumsum formulation on
    knife-edge distributions — the same tolerance class as HF's own
    torch.sort+cumsum."""
    if top_p >= 1.0:
        return logits
    lmax = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - lmax)                      # unnormalized probs
    target = top_p * jnp.sum(e, axis=-1, keepdims=True)

    # invariant: mass strictly above lo >= target > mass strictly above hi.
    # lo is clamped to lmax-88: logits further below lmax carry exactly
    # zero f32 mass (exp(-88) underflows), so they can never hold the
    # boundary — and without the clamp, previously-filtered logits at
    # NEG_INF would stretch the bracket to ~1e9, past what 40 halvings can
    # resolve.
    lo = jnp.maximum(jnp.min(logits, axis=-1, keepdims=True) - 1.0,
                     lmax - 88.0)
    hi = lmax

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        m = jnp.sum(jnp.where(logits > mid, e, 0.0), axis=-1, keepdims=True)
        big = m >= target
        return jnp.where(big, mid, lo), jnp.where(big, hi, mid)

    # 40 halvings shrink the bracket far below f32 spacing between distinct
    # logits, so exactly one logit value (the boundary) remains in (lo, hi]
    lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
    kth = jnp.min(jnp.where(logits > lo, logits, jnp.inf), axis=-1,
                  keepdims=True)
    return jnp.where(logits >= kth, logits, NEG_INF)


def typical_filter(logits: jnp.ndarray, mass: float = 0.9) -> jnp.ndarray:
    """TypicalLogitsWarper (ttts/utils/typical_sampling.py): keep tokens whose
    |-log p - H| is smallest until `mass` probability is covered."""
    norm = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(norm)
    ent = -jnp.sum(jnp.where(p > 0, p * norm, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-norm - ent)
    order = jnp.argsort(shifted, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.sum((cum < mass).astype(jnp.int32), axis=-1, keepdims=True)
    ranks = jnp.argsort(order, axis=-1)
    keep = ranks <= last_ind
    return jnp.where(keep, logits, NEG_INF)


def sample_token(key, logits: jnp.ndarray, temperature: float = 1.0,
                 top_p: float = 1.0, seen: jnp.ndarray | None = None,
                 repetition_penalty: float = 1.0,
                 typical_mass: float | None = None) -> jnp.ndarray:
    """Full HF-order sampling: rep-penalty -> (typical) -> temperature -> top-p
    -> categorical. logits (B, V) -> (B,) int32."""
    logits = logits.astype(jnp.float32)
    if seen is not None:
        logits = apply_repetition_penalty(logits, seen, repetition_penalty)
    if typical_mass is not None:
        logits = typical_filter(logits, typical_mass)
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def greedy_token(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token_rows(keys, logits: jnp.ndarray, temperature: float = 1.0,
                      top_p: float = 1.0, seen: jnp.ndarray | None = None,
                      repetition_penalty: float = 1.0,
                      typical_mass: float | None = None) -> jnp.ndarray:
    """sample_token with an INDEPENDENT key per row: keys (B, 2) uint32,
    logits (B, V) -> (B,) int32. Each row's draw depends only on its own
    key chain, so a request's sampled output is reproducible regardless of
    what else shares the batch (slot serving's per-request determinism —
    a shared-key batch draw changes with batch shape/composition)."""
    logits = logits.astype(jnp.float32)
    if seen is not None:
        logits = apply_repetition_penalty(logits, seen, repetition_penalty)
    if typical_mass is not None:
        logits = typical_filter(logits, typical_mass)
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_p_filter(logits, top_p)
    draw = jax.vmap(lambda k, l: jax.random.categorical(k, l))
    return draw(keys, logits).astype(jnp.int32)
