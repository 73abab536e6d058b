"""Diffusion sampling-loop component profiling on the real TPU.

The 50-step CFG loop is the largest e2e cost after three rounds of AR
kernel work (PERF.md: ~0.19 s of ~0.47 s p50). This times scan-wrapped
variants of ONE flagship denoiser step (2B CFG batch, hoisted ReferenceNet
features as in the live loop, xtts_tpu/infer/api.py:_diffusion_mel_impl) to
attribute the step cost to its parts — matching the reference hot loop at
ttts/utils/diffusion.py:284-386 / aa_model.py:329-339:

  full        the 2B-batched BaseModel denoise with injected control
  no_attn1    SpatialTransformer self-attn ([x ; refer] concat) removed
  no_attn2    cross-attn to the CLIP context removed
  no_ff       GEGLU feed-forwards removed
  no_res      UNet ResBlocks reduced to identity (attn only)
  refnet      the per-step ReferenceNet pass (what hoisting removes)
  clip        the CLIP reference encoder (runs once per utterance)

Run: python scripts/profile_diffusion.py  (holds the TPU; run alone)
Env: PROF_T_LAT latent length (default 300 -> 1200-frame mel),
     PROF_STEPS scan steps per timing (default 20), PROF_B batch (1).
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

from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.models.aa_diffusion import AADiffusion

B = int(os.environ.get("PROF_B", 1))
T_LAT = int(os.environ.get("PROF_T_LAT", 300))
N = int(os.environ.get("PROF_STEPS", 20))
T_REF = 300

cfg = XTTSConfig().diffusion


def timed(fn, *args):
    fn(*args)  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())  # host fetch
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    model = AADiffusion(cfg, dtype=jnp.bfloat16,
                        flash=os.environ.get("PROF_FLASH", "1") == "1")
    rng = np.random.default_rng(0)
    out_len = T_LAT * 4
    x = jnp.asarray(rng.standard_normal(
        (B, cfg.in_channels, out_len)).astype(np.float32))
    hint = jnp.asarray(rng.standard_normal(
        (B, cfg.in_latent_channels, out_len)).astype(np.float32))
    refer = jnp.asarray(rng.standard_normal(
        (B, cfg.in_channels, T_REF)).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, hint, refer)

    ctx = jax.jit(lambda v, r: model.apply(v, r, method=model.encode_reference)
                  )(variables, refer)
    control = jax.jit(lambda v, r, tt, c: model.apply(
        v, r, tt, c, method=model.reference_features))(variables, refer, t, ctx)

    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    h2 = jnp.concatenate([hint, hint], 0)
    c2 = jnp.concatenate([ctx, ctx], 0)
    ctrl2 = [jnp.concatenate([ci, ci], 0) for ci in control]

    def scan_denoise(v, x2, skip=()):
        def body(carry, i):
            out = model.apply(v, carry, t2 + i, h2, c2, ctrl2,
                              method=model.denoise, skip=skip)
            # keep the carry shape: out is 2C (eps + var); use eps half
            return carry + 1e-6 * out[:, :cfg.in_channels], i
        y, _ = jax.lax.scan(body, x2, jnp.arange(N))
        return y

    variants = {
        "full": (),
        "no_attn1": ("attn1",),
        "no_attn2": ("attn2",),
        "no_ff": ("ff",),
        "no_res": ("res",),
    }
    print(f"B={B} (CFG batch {2*B}), out_len={out_len}, refer={T_REF}, "
          f"scan N={N}")
    base = None
    for name, skip in variants.items():
        f = jax.jit(lambda v, xx, s=skip: scan_denoise(v, xx, s))
        dt = timed(f, variables, x2) / N * 1000
        if base is None:
            base = dt
        print(f"{name:10s} {dt:7.2f} ms/step   "
              f"(delta {base - dt:+6.2f} ms)")

    refnet = jax.jit(lambda v: model.apply(v, refer, t, ctx,
                                           method=model.reference_features))
    dt = timed(refnet, variables) * 1000
    print(f"{'refnet':10s} {dt:7.2f} ms/call (per-step cost the hoist removes)")
    clip = jax.jit(lambda v: model.apply(v, refer,
                                         method=model.encode_reference))
    dt = timed(clip, variables) * 1000
    print(f"{'clip':10s} {dt:7.2f} ms/call (once per utterance)")


if __name__ == "__main__":
    main()
