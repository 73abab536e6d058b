"""Decode-step component profiling on the real TPU.

Times scan-wrapped variants of the int8 decode step (100 iterations inside
one jitted program — per-op RTT on the tunnel makes anything else
meaningless, PERF.md). Variants isolate the byte streams:

  full        the shipped _decode_logits step
  no_head     without the mel_head matmul (8.4 MB int8)
  no_attn     without the KV-cache attention (cache read ~23 MB bf16)
  mats_only   just the 6 per-layer int8 matmuls (pure weight stream)

Run: python scripts/profile_decode.py  (holds the TPU; run alone)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.infer import qdecode
from xtts_tpu.nn.transformer import KVCache

B = int(os.environ.get("PROF_B", 1))
S_MAX = int(os.environ.get("PROF_S", 384))
N_STEPS = 100

cfg = GPTConfig()  # 15L / 1024d / 16h


def make_qtree(key):
    """Random quantized tree with the flagship shapes (no full model init)."""
    d, v = cfg.model_dim, cfg.number_mel_codes
    ks = jax.random.split(key, cfg.layers + 1)

    def qd(k, i, o):
        w = jax.random.normal(k, (i, o), jnp.float32) * 0.02
        return qdecode.quantize_dense(w)

    layers = []
    for i in range(cfg.layers):
        k1, k2, k3, k4 = jax.random.split(ks[i], 4)
        layers.append({
            "ln_1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "ln_2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": qd(k1, d, 3 * d), "qkv_b": jnp.zeros((3 * d,)),
            "proj": qd(k2, d, d), "proj_b": jnp.zeros((d,)),
            "fc": qd(k3, d, 4 * d), "fc_b": jnp.zeros((4 * d,)),
            "out": qd(k4, 4 * d, d), "out_b": jnp.zeros((d,)),
        })
    kh, ke = jax.random.split(ks[-1])
    return {
        "layers": layers,
        "ln_f": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "final_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "mel_head": qd(kh, d, v), "mel_head_b": jnp.zeros((v,)),
        "mel_embedding": jax.random.normal(ke, (v, d), jnp.bfloat16) * 0.02,
        "mel_pos_embedding": jax.random.normal(ke, (608, d), jnp.bfloat16) * 0.02,
    }


def timed(fn, *args, reps=3):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())  # ensure done
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    qt = make_qtree(jax.random.PRNGKey(0))
    cache = KVCache.zeros(cfg.layers, B, S_MAX, cfg.heads,
                          cfg.model_dim // cfg.heads, dtype=jnp.bfloat16)
    tok0 = jnp.zeros((B,), jnp.int32)

    def run_full(qt, cache):
        def body(carry, i):
            tok, cache = carry
            logits, cache = qdecode._decode_logits(qt, cfg.heads, tok,
                                                   i + 1, cache, 64 + i)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()
        (tok, cache), _ = jax.lax.scan(body, (tok0, cache),
                                       jnp.arange(N_STEPS))
        return tok

    def run_no_head(qt, cache):
        def body(carry, i):
            tok, cache = carry
            emb = (qt["mel_embedding"][tok]
                   + qt["mel_pos_embedding"][jnp.atleast_1d(i + 1)])
            normed, cache = qdecode._decode_step(qt, cfg.heads,
                                                 emb.astype(jnp.bfloat16),
                                                 cache, 64 + i)
            tok = jnp.argmax(normed, -1).astype(jnp.int32) % 8194
            return (tok, cache), ()
        (tok, cache), _ = jax.lax.scan(body, (tok0, cache),
                                       jnp.arange(N_STEPS))
        return tok

    def run_mats_only(qt):
        x0 = jnp.ones((B, cfg.model_dim), jnp.bfloat16) * 0.01

        def body(x, i):
            for lp in qt["layers"]:
                qkv = qdecode.qdot(x, lp["qkv"], lp["qkv_b"])
                q = qkv[:, :cfg.model_dim].astype(jnp.bfloat16)
                x = x + qdecode.qdot(q, lp["proj"], lp["proj_b"]).astype(x.dtype)
                m = qdecode.qdot(x, lp["fc"], lp["fc_b"]).astype(jnp.bfloat16)
                x = x + qdecode.qdot(m, lp["out"], lp["out_b"]).astype(x.dtype)
            head = qdecode.qdot(x, qt["mel_head"], qt["mel_head_b"])
            x = x * 0.999 + head[:, :cfg.model_dim].astype(x.dtype) * 1e-4
            return x, ()
        x, _ = jax.lax.scan(body, x0, jnp.arange(N_STEPS))
        return x

    def run_attn_only(cache):
        q0 = jnp.ones((B, cfg.heads, cfg.model_dim // cfg.heads), jnp.bfloat16)

        def body(carry, i):
            q, cache = carry
            kc, vc = cache.k, cache.v
            acc = q
            for li in range(cfg.layers):
                k_all, v_all = kc[li], vc[li]
                logits = jnp.einsum("bhd,bshd->bhs", q, k_all) / 8.0
                pos = jnp.arange(k_all.shape[1])
                logits = jnp.where((pos <= 64 + i)[None, None, :], logits,
                                   -1e9)
                w = jax.nn.softmax(logits.astype(jnp.float32), -1
                                   ).astype(jnp.bfloat16)
                acc = acc + jnp.einsum("bhs,bshd->bhd", w, v_all)
            return (acc / 16.0, cache), ()
        (q, _), _ = jax.lax.scan(body, (q0, cache), jnp.arange(N_STEPS))
        return q

    jf = jax.jit(run_full)
    jn = jax.jit(run_no_head)
    jm = jax.jit(run_mats_only)
    ja = jax.jit(run_attn_only)

    t_full = timed(jf, qt, cache) / N_STEPS
    t_nohead = timed(jn, qt, cache) / N_STEPS
    t_mats = timed(jm, qt) / N_STEPS
    t_attn = timed(ja, cache) / N_STEPS

    wbytes = (cfg.layers * (1024 * 3072 + 1024 * 1024 + 1024 * 4096 * 2)
              + 1024 * 8194)
    cbytes = cfg.layers * B * S_MAX * 2 * cfg.model_dim * 2
    print(f"B={B} S_max={S_MAX}  (weights {wbytes/1e6:.0f} MB int8, "
          f"cache {cbytes/1e6:.0f} MB bf16)")
    print(f"full step:        {t_full*1e3:.3f} ms  ({1/t_full:.0f} tok/s)")
    print(f"  -mel_head:      {t_nohead*1e3:.3f} ms")
    print(f"  mats only:      {t_mats*1e3:.3f} ms "
          f"(weight stream roof {wbytes/819e9*1e3:.3f} ms)")
    print(f"  attn only:      {t_attn*1e3:.3f} ms "
          f"(cache stream roof {cbytes/819e9*1e3:.3f} ms)")
    print(f"  residual (LN/sampling/updates): "
          f"{(t_full - t_mats - t_attn)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
