"""Fused Pallas decode step vs the XLA qdecode engine — real-TPU benchmark.

Runs N scan-wrapped decode steps of each engine at the flagship GPT shape
(15L/1024d/16h, 8194-vocab mel head) and reports ms/step + tok/s. Also
asserts greedy-argmax agreement between the two engines over the scanned
chain so the speed comparison is between provably-equivalent programs.

Run alone (holds the TPU): python scripts/bench_fused_decode.py
Env: FUSED_S (default 640) cache length, FUSED_N (default 100) steps.
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
from xtts_tpu.ops import decode_step
from scripts.profile_decode import make_qtree, timed

S_MAX = int(os.environ.get("FUSED_S", 640))
N = int(os.environ.get("FUSED_N", 100))
PREFIX = 24

cfg = GPTConfig()


def main():
    qt = make_qtree(jax.random.PRNGKey(0))
    stacked = decode_step.stack_qtree(qt, cfg.number_mel_codes)
    d, heads, layers = cfg.model_dim, cfg.heads, cfg.layers

    rng = np.random.default_rng(0)
    k0 = np.zeros((layers, 1, S_MAX, heads, d // heads), np.float32)
    v0 = np.zeros_like(k0)
    k0[:, :, :PREFIX] = rng.standard_normal(k0[:, :, :PREFIX].shape) * 0.5
    v0[:, :, :PREFIX] = rng.standard_normal(k0[:, :, :PREFIX].shape) * 0.5
    cache = KVCache(jnp.asarray(k0, jnp.bfloat16), jnp.asarray(v0, jnp.bfloat16))
    kc0 = cache.k[:, 0].reshape(layers, S_MAX, d)
    vc0 = cache.v[:, 0].reshape(layers, S_MAX, d)
    tok0 = jnp.zeros((1,), jnp.int32)

    def run_xla(qt, cache):
        def body(carry, i):
            tok, cache = carry
            logits, cache = qdecode._decode_logits(qt, heads, tok, i + 1,
                                                   cache, PREFIX + i)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), tok
        (tok, _), toks = jax.lax.scan(body, (tok0, cache), jnp.arange(N))
        return toks

    def run_fused(stacked_arrs, kc, vc):
        def body(carry, i):
            tok, kc, vc = carry
            x = (qt["mel_embedding"][tok]
                 + qt["mel_pos_embedding"][jnp.atleast_1d(i + 1)])
            logits, kc, vc = decode_step._fused_decode_logits(
                stacked_arrs, x, kc, vc, PREFIX + i, layers=layers,
                heads=heads, head_tiles=stacked["head_tiles"],
                interpret=False, group=decode_step.GROUP,
                ring=decode_step.RING)
            tok = jnp.argmax(logits[:1, :cfg.number_mel_codes], -1
                             ).astype(jnp.int32)
            return (tok, kc, vc), tok
        (tok, kc, vc), toks = jax.lax.scan(body, (tok0, kc, vc),
                                           jnp.arange(N))
        return toks

    arrs = {k: v for k, v in stacked.items()
            if k not in ("head_tiles", "vocab")}
    jx = jax.jit(run_xla)
    jf = jax.jit(run_fused, donate_argnums=(1, 2))

    print("compiling XLA engine ...", flush=True)
    toks_x = np.asarray(jx(qt, cache))
    print("compiling fused kernel ...", flush=True)
    toks_f = np.asarray(jf(arrs, kc0, vc0))

    agree = float((toks_x == toks_f).mean())
    print(f"greedy agreement over {N} steps: {agree:.3f}")

    t_x = timed(jx, qt, cache) / N
    # donated args: re-make inputs per rep
    best = 1e9
    for _ in range(3):
        kc = jnp.array(kc0)
        vc = jnp.array(vc0)
        t0 = time.perf_counter()
        out = jf(arrs, kc, vc)
        float(out.sum())
        best = min(best, time.perf_counter() - t0)
    t_f = best / N

    wbytes = (layers * (1024 * 3072 + 1024 * 1024 + 1024 * 4096 * 2)
              + 1024 * 8194)
    roof = wbytes / 819e9
    print(f"S_max={S_MAX} prefix={PREFIX} steps={N}")
    print(f"XLA engine:   {t_x*1e3:.3f} ms/step ({1/t_x:.0f} tok/s)")
    print(f"fused kernel: {t_f*1e3:.3f} ms/step ({1/t_f:.0f} tok/s)")
    print(f"speedup: {t_x/t_f:.2f}x   weight-stream roof {roof*1e3:.3f} ms "
          f"(+cache ~{layers*S_MAX*d*2*2/819e9*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
