"""int8 weight-only quantized AR decode engine.

The batch-1 decode hot loop is weight-bandwidth bound (~630 GB/s effective
streaming 378 MB of GPT weights per token — PERF.md). Per-output-channel
symmetric int8 halves the bytes; measured 1.46x faster per decode step in a
decode-shaped while_loop on v5e (XLA fuses the int8->bf16 convert into the
small-M matmul well enough; a Pallas fused-dequant matvec is the next rung).

Design: the per-token step is implemented as plain functions over a
quantized param tree (mirroring xtts_tpu/nn/transformer.py numerics exactly
— pre-LN f32, gelu_new, f32 softmax, 1/sqrt(hd) scaling). Prefill and
conditioning stay in the flax model (compute-bound, runs once); only the
per-token loop switches to the quantized engine. This is an opt-in speed
mode: logits match bf16 within per-channel-int8 error (~1e-2 relative), so
sampled tokens can differ at near-ties.

No reference equivalent: the reference's closest knob is fp16 DeepSpeed
kernel injection (ttts/gpt/model.py:384-397).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.infer.sampling import greedy_token, sample_token
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.models.gpt_infer import GenerateResult
from xtts_tpu.nn.transformer import KVCache, NEG_INF, gelu_new


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------

def quantize_dense(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(in, out) f32/bf16 kernel -> {w: int8, scale: f32[out]} symmetric
    per-output-channel."""
    k32 = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(k32), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    w = jnp.clip(jnp.round(k32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"w": w, "scale": scale}


def qdot(x: jnp.ndarray, q: Dict[str, jnp.ndarray],
         bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x (B, in) @ int8 kernel -> f32 (B, out)."""
    y = jnp.dot(x, q["w"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * q["scale"]
    if bias is not None:
        y = y + bias
    return y


def quantize_gpt_decode(variables, cfg, include_fused: bool = True
                        ) -> Dict[str, Any]:
    """UnifiedVoice variables -> quantized decode tree.

    Quantizes the transformer block matmuls + mel_head; keeps LayerNorms,
    embeddings and biases exact. include_fused=False skips the fused-kernel
    tile stack (a second ~190 MB copy of the weights) — callers that only
    run the XLA chain (batched serving) should skip it; attach later with
    attach_fused_stack() when the fused engine is first needed.
    """
    p = variables["params"]
    g = p["gpt"]
    out: Dict[str, Any] = {"layers": []}
    for i in range(cfg.layers):
        h = g[f"h_{i}"]
        out["layers"].append({
            "ln_1": {k: jnp.asarray(v, jnp.float32)
                     for k, v in h["ln_1"].items()},
            "ln_2": {k: jnp.asarray(v, jnp.float32)
                     for k, v in h["ln_2"].items()},
            "qkv": quantize_dense(h["attn"]["c_attn"]["kernel"]),
            "qkv_b": jnp.asarray(h["attn"]["c_attn"]["bias"], jnp.float32),
            "proj": quantize_dense(h["attn"]["c_proj"]["kernel"]),
            "proj_b": jnp.asarray(h["attn"]["c_proj"]["bias"], jnp.float32),
            "fc": quantize_dense(h["mlp"]["c_fc"]["kernel"]),
            "fc_b": jnp.asarray(h["mlp"]["c_fc"]["bias"], jnp.float32),
            "out": quantize_dense(h["mlp"]["c_proj"]["kernel"]),
            "out_b": jnp.asarray(h["mlp"]["c_proj"]["bias"], jnp.float32),
        })
    out["ln_f"] = {k: jnp.asarray(v, jnp.float32)
                   for k, v in g["ln_f"].items()}
    out["final_norm"] = {k: jnp.asarray(v, jnp.float32)
                         for k, v in p["final_norm"].items()}
    out["mel_head"] = quantize_dense(p["mel_head"]["kernel"])
    out["mel_head_b"] = jnp.asarray(p["mel_head"]["bias"], jnp.float32)
    out["mel_embedding"] = jnp.asarray(p["mel_embedding"]["embedding"],
                                       jnp.bfloat16)
    out["mel_pos_embedding"] = jnp.asarray(
        p["mel_pos_embedding"]["embedding"], jnp.bfloat16)
    if include_fused:
        attach_fused_stack(out, cfg)
    return out


def attach_fused_stack(qtree: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Add the uniform (D, D)-tile stack for the fused single-launch decode
    kernel (ops/decode_step.py) to a quantized tree, in place; array-only so
    the tree stays a plain jit pytree. XTTS_DECODE_BITS=4 packs int4 nibbles
    instead (halves the weight stream; lossier — see stack_qtree_int4)."""
    import os as _os
    from xtts_tpu.ops.decode_step import stack_qtree, stack_qtree_int4
    builder = (stack_qtree_int4
               if _os.environ.get("XTTS_DECODE_BITS") == "4" else stack_qtree)
    stacked = builder(qtree, cfg.number_mel_codes)
    qtree["fused"] = {k: v for k, v in stacked.items()
                      if k not in ("head_tiles", "vocab")}
    return qtree


# ---------------------------------------------------------------------------
# int8 KV cache: at B=8 serving the cache read dominates the per-step byte
# stream (PERF.md) — per-(position, head) symmetric int8 halves it
# ---------------------------------------------------------------------------


class QuantKVCache(NamedTuple):
    k: jnp.ndarray         # (L, B, S, H, hd) int8
    v: jnp.ndarray
    k_scale: jnp.ndarray   # (L, B, S, H) f32
    v_scale: jnp.ndarray


def _quant_heads(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., hd) f32 -> (int8 values, f32 scale over the hd axis)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kv(cache: KVCache) -> QuantKVCache:
    """Quantize a (prefilled) bf16/f32 cache wholesale."""
    kq, ks = _quant_heads(cache.k.astype(jnp.float32))
    vq, vs = _quant_heads(cache.v.astype(jnp.float32))
    return QuantKVCache(kq, vq, ks, vs)


# ---------------------------------------------------------------------------
# functional decode step (mirrors nn/transformer.py Block.step numerics)
# ---------------------------------------------------------------------------

def _layer_norm(x: jnp.ndarray, ln: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]


def _cached_attention(q: jnp.ndarray, k_all: jnp.ndarray, v_all: jnp.ndarray,
                      index) -> jnp.ndarray:
    """Single-token attention over the cached prefix: q (B, H, hd),
    k_all/v_all (B, S, H, hd) -> (B, H, hd). Plain XLA einsum — a Pallas
    per-layer flash-decode kernel (3 variants, incl. a batched strided-DMA
    one) was built, won in isolation (78.7 vs 88.9 us at B=8/S=1024), and
    LOST 25% inside the real 15-layer program (2.64 vs 2.10 ms/step): 15
    custom-call launches/step break XLA's fusion scheduling. Deleted in
    round 4 (graveyard note in PERF.md) once the FUSED whole-step serving
    kernel (ops/serving_step.py) won the same regime properly (1.62x,
    scripts/ab_fused_serving.py)."""
    b, s, heads, hd = k_all.shape
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.bfloat16),
                        k_all.astype(jnp.bfloat16)) * scale
    pos = jnp.arange(s)
    valid = (pos <= index)[None, None, :]
    logits = jnp.where(valid, logits, NEG_INF)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                       ).astype(jnp.bfloat16)
    return jnp.einsum("bhs,bshd->bhd", w, v_all.astype(jnp.bfloat16))


def _decode_step(qt: Dict[str, Any], heads: int, x: jnp.ndarray,
                 cache: KVCache, index) -> Tuple[jnp.ndarray, KVCache]:
    """x: (B, D) bf16 single-token hidden; returns (normed (B, D), cache)."""
    b, d = x.shape
    hd = d // heads
    kc, vc = cache.k, cache.v
    for li, lp in enumerate(qt["layers"]):
        h = _layer_norm(x, lp["ln_1"]).astype(jnp.bfloat16)
        qkv = qdot(h, lp["qkv"], lp["qkv_b"])          # (B, 3D) f32
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, heads, hd)
        k = k.reshape(b, heads, hd)
        v = v.reshape(b, heads, hd)
        kc = jax.lax.dynamic_update_slice(
            kc, k[None, :, None].astype(kc.dtype), (li, 0, index, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v[None, :, None].astype(vc.dtype), (li, 0, index, 0, 0))
        k_all = kc[li]                                  # (B, S, H, hd)
        v_all = vc[li]
        a = _cached_attention(q, k_all, v_all, index).reshape(b, d)
        x = x + qdot(a, lp["proj"], lp["proj_b"]).astype(x.dtype)
        h2 = _layer_norm(x, lp["ln_2"]).astype(jnp.bfloat16)
        m = gelu_new(qdot(h2, lp["fc"], lp["fc_b"])).astype(jnp.bfloat16)
        x = x + qdot(m, lp["out"], lp["out_b"]).astype(x.dtype)
    normed = _layer_norm(x, qt["ln_f"])
    return normed, KVCache(kc, vc)


def _decode_step_qkv(qt: Dict[str, Any], heads: int, x: jnp.ndarray,
                     cache: QuantKVCache, index
                     ) -> Tuple[jnp.ndarray, QuantKVCache]:
    """_decode_step against an int8 KV cache (dequant fused into the
    attention reads; new tokens quantized at write)."""
    b, d = x.shape
    hd = d // heads
    scale = 1.0 / np.sqrt(hd)
    kc, vc, ksc, vsc = cache
    for li, lp in enumerate(qt["layers"]):
        h = _layer_norm(x, lp["ln_1"]).astype(jnp.bfloat16)
        qkv = qdot(h, lp["qkv"], lp["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, heads, hd)
        kq, ks = _quant_heads(k.reshape(b, heads, hd))
        vq, vs = _quant_heads(v.reshape(b, heads, hd))
        kc = jax.lax.dynamic_update_slice(kc, kq[None, :, None],
                                          (li, 0, index, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, vq[None, :, None],
                                          (li, 0, index, 0, 0))
        ksc = jax.lax.dynamic_update_slice(ksc, ks[None, :, None],
                                           (li, 0, index, 0))
        vsc = jax.lax.dynamic_update_slice(vsc, vs[None, :, None],
                                           (li, 0, index, 0))
        # dequant FOLDED OUT of the cache operands: the dot consumes the
        # int8 cache through a bare convert (operand-fusible — no (B,S,H,hd)
        # bf16 cache copy materializes, the round-2 regression cause) and
        # the per-(position, head) scales apply to the (B,H,S) scores/probs
        # instead — mathematically the same row scaling, and MORE accurate
        # (int8 values stay exact inside the f32-accumulating dot)
        logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.bfloat16),
                            kc[li].astype(jnp.bfloat16))
        logits = logits * jnp.swapaxes(ksc[li], 1, 2) * scale
        pos = jnp.arange(kc[li].shape[1])
        valid = (pos <= index)[None, None, :]
        logits = jnp.where(valid, logits, NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w = (w * jnp.swapaxes(vsc[li], 1, 2)).astype(jnp.bfloat16)
        a = jnp.einsum("bhs,bshd->bhd", w,
                       vc[li].astype(jnp.bfloat16)).reshape(b, d)
        x = x + qdot(a, lp["proj"], lp["proj_b"]).astype(x.dtype)
        h2 = _layer_norm(x, lp["ln_2"]).astype(jnp.bfloat16)
        m = gelu_new(qdot(h2, lp["fc"], lp["fc_b"])).astype(jnp.bfloat16)
        x = x + qdot(m, lp["out"], lp["out_b"]).astype(x.dtype)
    normed = _layer_norm(x, qt["ln_f"])
    return normed, QuantKVCache(kc, vc, ksc, vsc)


def _decode_logits(qt: Dict[str, Any], heads: int, token: jnp.ndarray,
                   mel_pos, cache, index):
    """Token (B,) -> (logits (B, V), cache) — UnifiedVoice.decode_one with
    quantized weights (models/gpt.py:214-223 numerics)."""
    emb = (qt["mel_embedding"][token]
           + qt["mel_pos_embedding"][jnp.atleast_1d(mel_pos)])
    step = (_decode_step_qkv if isinstance(cache, QuantKVCache)
            else _decode_step)
    normed, cache = step(qt, heads, emb.astype(jnp.bfloat16), cache, index)
    final = _layer_norm(normed.astype(jnp.bfloat16), qt["final_norm"])
    logits = qdot(final.astype(jnp.bfloat16), qt["mel_head"],
                  qt["mel_head_b"])
    return logits, cache


# ---------------------------------------------------------------------------
# quantization quality gate (VERDICT r2 #9)
# ---------------------------------------------------------------------------

def requantize_int4_tree(qtree: Dict[str, Any]) -> Dict[str, Any]:
    """Emulate the fused kernel's int4 weight grid in the XLA-chain tree.

    Uses stack_qtree_int4's exact math (ops/decode_step.py:427-432):
    dequantize the int8 weights, re-quantize per-output-channel symmetric to
    [-7, 7]. The resulting tree runs through the plain XLA engine, so int4
    WEIGHT quality is measurable on any backend without the fused kernel."""
    def requant(q):
        w = q["w"].astype(jnp.float32) * q["scale"][None, :]
        s4 = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 7.0, 1e-8)
        w4 = jnp.clip(jnp.round(w / s4[None, :]), -7, 7).astype(jnp.int8)
        return {"w": w4, "scale": s4}

    out = dict(qtree)
    out["layers"] = [
        {k: (requant(v) if k in ("qkv", "proj", "fc", "out") else v)
         for k, v in layer.items()}
        for layer in qtree["layers"]]
    out["mel_head"] = requant(qtree["mel_head"])
    return out


@functools.partial(jax.jit, static_argnames=("model", "kv_quant",
                                             "fused_serving"))
def _teacher_forced_agreement(model: UnifiedVoice, variables, qtree,
                              cond_mel, text_tokens, codes,
                              kv_quant: bool = False,
                              fused_serving: bool = False):
    """Per-position greedy-argmax agreement between the quantized decode
    engine and the full-precision decode chain under TEACHER FORCING: both
    engines see the same ground-truth history, so agreement isolates
    per-step logit fidelity from compounding sampling drift.

    kv_quant: the quantized arm additionally stores K/V as per-(position,
    head) int8 (the serving kv_quant lever). fused_serving: the quantized
    arm runs the whole-step Pallas serving kernel over its coarser
    per-(layer, row, position) int8 cache (ops/serving_step.py)."""
    cfg = model.cfg
    d = cfg.model_dim
    prefix, n_cond = model.apply(variables, cond_mel, text_tokens,
                                 method=model.encode_prefix)
    b, p_len, _ = prefix.shape
    n = codes.shape[1]
    s_max = p_len + n + 1
    mk_cache = lambda: KVCache.zeros(cfg.layers, b, s_max, cfg.heads,
                                     cfg.model_dim // cfg.heads,
                                     dtype=jnp.bfloat16)
    _, cache_f = model.apply(variables, prefix, mk_cache(),
                             method=model.prefill)
    _, cache_q = model.apply(variables, prefix, mk_cache(),
                             method=model.prefill)
    if fused_serving:
        from xtts_tpu.ops.serving_step import (_fused_serving_logits,
                                               _pick_chunk,
                                               quantize_kv_rowwise)
        s_pad = -(-s_max // _pick_chunk(b, d, s_max)) * _pick_chunk(b, d,
                                                                    s_max)
        cache_q = quantize_kv_rowwise(cache_q, s_pad)
        vocab = cfg.number_mel_codes
        stacked = {k: v for k, v in qtree["fused"].items() if k != "pmat"}
        ht = -(-vocab // d)
        interp = jax.default_backend() != "tpu"
    elif kv_quant:
        cache_q = quantize_kv(cache_q)

    def body(carry, t):
        cache_f, cache_q = carry
        tok = codes[:, t]
        mel_pos = t + 1 + (n_cond if cfg.decode_position_quirk else 0)
        lf, cache_f = model.apply(variables, tok, mel_pos, cache_f,
                                  p_len + t, method=model.decode_one)
        if fused_serving:
            x = (qtree["mel_embedding"][tok]
                 + qtree["mel_pos_embedding"][jnp.atleast_1d(mel_pos)])
            kc, vc, ks, vs = cache_q
            lq, kc, vc, ks, vs = _fused_serving_logits(
                stacked, x, kc, vc, ks, vs, p_len + t,
                layers=cfg.layers, heads=cfg.heads, head_tiles=ht,
                interpret=interp)
            lq = lq[:, :vocab].astype(jnp.float32)
            cache_q = (kc, vc, ks, vs)
        else:
            lq, cache_q = _decode_logits(qtree, cfg.heads, tok, mel_pos,
                                         cache_q, p_len + t)
        return (cache_f, cache_q), (jnp.argmax(lf, -1), jnp.argmax(lq, -1))

    _, (af, aq) = jax.lax.scan(body, (cache_f, cache_q), jnp.arange(n))
    return jnp.mean((af == aq).astype(jnp.float32))


def quantization_quality_gate(model: UnifiedVoice, variables, cond_mel,
                              text_tokens, codes, bits: int = 8,
                              kv_quant: bool = False,
                              fused_serving: bool = False,
                              min_agreement: float = 0.98) -> Dict[str, Any]:
    """The acceptance check for enabling a quantized decode engine by
    default on a given set of weights (VERDICT r2 #9).

    Measures teacher-forced greedy top-1 agreement of the quantized engine
    against the full-precision decode chain over the provided mel-code
    sequences. A trained model's peaked logits score far higher than
    random weights (PERF.md round 2: ~2/3 on random int4); gate on REAL
    converted weights before flipping a default.

    Engine selection mirrors the serving levers:
      bits=8|4            int8 / int4-grid weights (bf16 KV cache)
      kv_quant=True       + per-(position, head) int8 KV
                          (TTSSettings.kv_quant)
      fused_serving=True  the whole-step Pallas serving kernel over its
                          coarser per-(layer, row, position) int8 KV
                          (XTTS_FUSED_SERVING; rows must be 8 or 16)

    Returns {bits, kv_quant, fused_serving, agreement, n_positions,
    min_agreement, passed}. Policy: int8 weights default on at >= 0.98;
    the int8-KV levers (kv_quant / fused_serving) and int4 stay opt-in
    until their gate passes on the target checkpoint.
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if kv_quant and fused_serving:
        raise ValueError("kv_quant and fused_serving are separate engines; "
                         "gate them one at a time")
    qtree = quantize_gpt_decode(variables, model.cfg,
                                include_fused=fused_serving)
    if bits == 4:
        qtree = requantize_int4_tree(qtree)
    agreement = float(_teacher_forced_agreement(
        model, variables, qtree, jnp.asarray(cond_mel),
        jnp.asarray(text_tokens, jnp.int32), jnp.asarray(codes, jnp.int32),
        kv_quant=kv_quant, fused_serving=fused_serving))
    return {"bits": bits, "kv_quant": kv_quant,
            "fused_serving": fused_serving, "agreement": agreement,
            "n_positions": int(codes.shape[0]) * int(codes.shape[1]),
            "min_agreement": min_agreement,
            "passed": agreement >= min_agreement}


# ---------------------------------------------------------------------------
# generation loop
# ---------------------------------------------------------------------------

def _grow_cache_axis2(cache, new_s: int):
    """Zero-extend every cache array along the position axis (axis 2).
    Padded positions dequantize/attend to exact zeros and are masked by
    `pos <= index`, so growth is numerics-neutral."""
    def grow(a):
        pad = [(0, 0)] * a.ndim
        pad[2] = (0, new_s - a.shape[2])
        return jnp.pad(a, pad)
    return type(cache)(*(grow(a) for a in cache))


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_gen", "do_sample", "top_p", "temperature",
                     "repetition_penalty", "cache_dtype",
                     "quantize_kv_cache", "use_fused", "use_fused_serving",
                     "cache_ladder"),
)
def generate_speech_quantized(
    model: UnifiedVoice,
    variables,
    qtree,
    cond_mel: jnp.ndarray,
    text_tokens: jnp.ndarray,
    key: jax.Array,
    max_gen: int = 600,
    do_sample: bool = True,
    top_p: float = 0.8,
    temperature: float = 0.8,
    repetition_penalty: float = 2.0,
    cache_dtype=jnp.bfloat16,
    quantize_kv_cache: bool = False,
    use_fused: bool = False,
    use_fused_serving: bool = False,
    cache_ladder: Optional[tuple] = None,
) -> GenerateResult:
    """generate_speech with the int8 per-token engine. Prefill (one big
    compute-bound pass) stays bf16-flax; the while_loop uses qtree.
    quantize_kv_cache stores K/V as per-(position, head) int8 — halves the
    cache bytes IN MEMORY, but measured SLOWER on v5e via XLA (B=8: 0.91 ->
    1.18 ms/step): the dequant materializes a full bf16 cache copy per layer
    per step instead of fusing into the attention reads. Kept opt-in for
    memory-bound regimes / a future Pallas fused-dequant attention kernel.
    use_fused (B=1 only): run each token as ONE pallas_call — the fused
    single-launch decode kernel (ops/decode_step.py), measured 1.11-1.16x
    over the XLA step chain at the flagship shape.
    cache_ladder: segmented cache-capacity ladder (see
    gpt_infer.generate_speech) — the TPU equivalent of KV-cache paging.
    Applies to BOTH the XLA chain (serving regime: cache reads dominate)
    and the fused B=1 kernel (whose per-layer DMA copies the whole (S, D)
    cache, so smaller early rungs cut per-token cache traffic ~Sx); each
    rung compiles its own kernel at the 8-aligned segment length."""
    cfg = model.cfg
    stop = cfg.stop_mel_token
    vocab = cfg.number_mel_codes
    d = cfg.model_dim

    prefix, n_cond = model.apply(variables, cond_mel, text_tokens,
                                 method=model.encode_prefix)
    b, p_len, _ = prefix.shape
    fused = (use_fused and b == 1 and not quantize_kv_cache
             and cache_dtype == jnp.bfloat16)
    # fused batched serving step (ops/serving_step.py): whole step in one
    # pallas_call over an int8 row-quantized KV cache; experimental
    # (XTTS_FUSED_SERVING=1), B in {8, 16} only
    fserv = (use_fused_serving and not fused and b in (8, 16)
             and cache_dtype == jnp.bfloat16)
    from xtts_tpu.models.gpt_infer import ladder_caps
    caps = ladder_caps(cache_ladder, max_gen)
    if fserv:
        from xtts_tpu.ops.serving_step import _pick_chunk
        s_cap = p_len + caps[-1]
        chunk = _pick_chunk(b, d, s_cap)

    def seg_len(cap: int) -> int:
        # Mosaic DMA slices need 8-aligned sublane extents (CLAUDE.md):
        # the fused kernels' cache DMAs copy (s, D) / (B, Sc, D) blocks, so
        # pad the cache length up (to a chunk multiple for the batched
        # kernel); decode never reads past `index` so padding is inert
        s = p_len + cap
        if fserv:
            return -(-s // chunk) * chunk
        return -(-s // 8) * 8 if fused else s

    s_max = seg_len(caps[0])
    # (cache_dtype != bf16 falls back to the XLA chain: the fused kernel's
    # cache buffers are bf16, so honoring an f32 cache request there would
    # silently change the precision the caller asked for)
    if fused and "fused" not in qtree:
        raise ValueError(
            "use_fused=True but the qtree has no fused tile stack — build "
            "it with quantize_gpt_decode(..., include_fused=True) or "
            "attach_fused_stack(qtree, cfg)")
    if fserv and "fused" not in qtree:
        raise ValueError(
            "use_fused_serving=True but the qtree has no fused tile stack — "
            "build it with attach_fused_stack(qtree, cfg)")
    cache = KVCache.zeros(cfg.layers, b, s_max, cfg.heads,
                          cfg.model_dim // cfg.heads, dtype=cache_dtype)
    logits0, cache = model.apply(variables, prefix, cache, method=model.prefill)
    if fserv:
        from xtts_tpu.ops.serving_step import quantize_kv_rowwise
        cache = quantize_kv_rowwise(cache, s_max)   # (kc, vc, ks, vs)
    elif quantize_kv_cache:
        cache = quantize_kv(cache)

    if fused:
        from xtts_tpu.ops import decode_step as _ds
        head_tiles = -(-vocab // d)
        interp = jax.default_backend() != "tpu"

        def fused_group(s: int) -> int:
            # VMEM budget: weight ring (ring*group MB int8) + 2 cache
            # buffers (2*s*d*2 B) + ~2.5 MB aux must stay under the 16 MB
            # scoped limit — shrink the DMA group at long cache buckets
            cache_mb = 2 * s * d * 2 / (1 << 20)
            g = _ds.GROUP
            while g > 1 and _ds.RING * g + cache_mb > 12.0:
                g //= 2
            return g

        cache = (cache.k.reshape(cfg.layers, s_max, d).astype(jnp.bfloat16),
                 cache.v.reshape(cfg.layers, s_max, d).astype(jnp.bfloat16))

    seen0 = jnp.zeros((b, vocab), bool)
    seen0 = seen0.at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
    codes0 = jnp.full((b, max_gen), stop, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    lengths0 = jnp.zeros((b,), jnp.int32)

    def make_body(group=None):
        def body_fn(st):
            step, logits, cache, done, seen, codes, lengths, k = st
            k, sub = jax.random.split(k)
            if do_sample:
                tok = sample_token(sub, logits, temperature=temperature,
                                   top_p=top_p, seen=seen,
                                   repetition_penalty=repetition_penalty)
            else:
                tok = greedy_token(logits)
            tok = jnp.where(done, stop, tok)
            codes = jax.lax.dynamic_update_slice(codes, tok[:, None],
                                                 (0, step))
            seen = seen.at[jnp.arange(b), tok].set(True)
            now_done = done | (tok == stop)
            lengths = jnp.where(done, lengths, step + 1)
            # same mel-position convention as gpt_infer (reference quirk at
            # ttts/gpt/model.py:147-149 embeds code t at position n_cond+1+t)
            mel_pos = step + 1 + (n_cond if cfg.decode_position_quirk else 0)
            if fserv:
                from xtts_tpu.ops import serving_step as _ss
                kc, vc, ks, vs = cache
                x = (qtree["mel_embedding"][tok]
                     + qtree["mel_pos_embedding"][jnp.atleast_1d(mel_pos)])
                logits, kc, vc, ks, vs = _ss._fused_serving_logits(
                    {k2: v2 for k2, v2 in qtree["fused"].items()
                     if k2 != "pmat"},
                    x, kc, vc, ks, vs, p_len + step,
                    layers=cfg.layers, heads=cfg.heads,
                    head_tiles=-(-vocab // d),
                    interpret=jax.default_backend() != "tpu")
                logits = logits[:, :vocab].astype(jnp.float32)
                cache = (kc, vc, ks, vs)
            elif fused:
                kc, vc = cache
                x = (qtree["mel_embedding"][tok]
                     + qtree["mel_pos_embedding"][jnp.atleast_1d(mel_pos)])
                logits, kc, vc = _ds._fused_decode_logits(
                    qtree["fused"], x, kc, vc, p_len + step,
                    layers=cfg.layers, heads=cfg.heads,
                    head_tiles=head_tiles, interpret=interp, group=group,
                    ring=_ds.RING)
                logits = logits[:, :vocab].astype(jnp.float32)
                cache = (kc, vc)
            else:
                logits, cache = _decode_logits(qtree, cfg.heads, tok,
                                               mel_pos, cache, p_len + step)
            return (step + 1, logits, cache, now_done, seen, codes, lengths,
                    k)
        return body_fn

    state = (jnp.int32(0), logits0.astype(jnp.float32), cache, done0, seen0,
             codes0, lengths0, key)
    for i, cap in enumerate(caps):
        new_s = seg_len(cap)
        if i:  # grow the cache into the next rung (zero-pad is exact)
            st = list(state)
            if fserv:
                kc, vc, ks, vs = st[2]
                dp = new_s - kc.shape[2]
                pad4 = ((0, 0), (0, 0), (0, dp), (0, 0))
                st[2] = (jnp.pad(kc, pad4), jnp.pad(vc, pad4),
                         jnp.pad(ks, pad4[:-1]), jnp.pad(vs, pad4[:-1]))
            elif fused:
                # fused-path cache is a pair of (L, S, D) buffers; the
                # kernel's per-layer DMA copies the WHOLE (S, D) cache, so
                # smaller early rungs cut cache traffic directly
                kc, vc = st[2]
                pad = ((0, 0), (0, new_s - kc.shape[1]), (0, 0))
                st[2] = (jnp.pad(kc, pad), jnp.pad(vc, pad))
            else:
                st[2] = _grow_cache_axis2(st[2], new_s)
            state = tuple(st)

        def seg_cond(st, _cap=cap):
            step, _, _, done, *_ = st
            return (step < _cap) & ~jnp.all(done)

        body = make_body(fused_group(new_s)) if fused else make_body()
        state = jax.lax.while_loop(seg_cond, body, state)
    step, _, _, done, _, codes, lengths, _ = state
    return GenerateResult(codes, lengths, step)
