"""Serving decode step with/without the Pallas batched attention kernel.

Scans N int8 decode steps at (B, S_max) and reports ms/step. Run twice:
  XTTS_BATCHED_ATTN=0 python scripts/bench_batched_attn.py   # XLA einsum
  XTTS_BATCHED_ATTN=1 python scripts/bench_batched_attn.py   # Pallas kernel
Defaults B=8 S=1024 N=200 (env BA_B / BA_S / BA_N).
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
from scripts.profile_decode import make_qtree

B = int(os.environ.get("BA_B", 8))
S_MAX = int(os.environ.get("BA_S", 1024))
N = int(os.environ.get("BA_N", 200))
PREFIX = 24
cfg = GPTConfig()


def main():
    print(f"B={B} S={S_MAX} N={N} XTTS_BATCHED_ATTN="
          f"{os.environ.get('XTTS_BATCHED_ATTN', '<auto>')}")
    qt = make_qtree(jax.random.PRNGKey(0))
    d, heads, layers = cfg.model_dim, cfg.heads, cfg.layers
    rng = np.random.default_rng(0)
    k0 = np.zeros((layers, B, S_MAX, heads, d // heads), np.float32)
    k0[:, :, :PREFIX] = rng.standard_normal(k0[:, :, :PREFIX].shape) * 0.5
    cache = KVCache(jnp.asarray(k0, jnp.bfloat16),
                    jnp.asarray(k0 * 0.7, jnp.bfloat16))
    tok0 = jnp.zeros((B,), jnp.int32)

    def run(qt, cache):
        def body(carry, i):
            tok, cache = carry
            logits, cache = qdecode._decode_logits(qt, heads, tok, i + 1,
                                                   cache, PREFIX + i)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), tok
        (tok, _), toks = jax.lax.scan(body, (tok0, cache), jnp.arange(N))
        return toks

    f = jax.jit(run)
    toks = np.asarray(f(qt, cache))   # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(qt, cache)
        float(out.sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{best/N*1e3:.3f} ms/step ({B*N/best:.0f} agg tok/s)  "
          f"[checksum {int(toks.sum())}]")


if __name__ == "__main__":
    main()
