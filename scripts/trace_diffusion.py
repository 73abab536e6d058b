"""HLO-level trace of the diffusion denoise step on the real TPU.

Captures a jax.profiler trace of the scan-wrapped flagship denoise step
(same program as scripts/profile_diffusion.py "full") and prints the top
HLO ops by total device self-time, parsed straight from the xplane
protobuf (the tensorboard UI isn't available in this image).

Run: python scripts/trace_diffusion.py  (holds the TPU; run alone)
Env: PROF_T_LAT (300), PROF_STEPS (20), TRACE_TOP (30).
"""
import collections
import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.models.aa_diffusion import AADiffusion

B = int(os.environ.get("PROF_B", 1))
T_LAT = int(os.environ.get("PROF_T_LAT", 300))
N = int(os.environ.get("PROF_STEPS", 20))
TOP = int(os.environ.get("TRACE_TOP", 30))
T_REF = 300

cfg = XTTSConfig().diffusion


def summarize(trace_dir):
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow/tsl/profiler/protobuf")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    totals = collections.Counter()
    cat_totals = collections.Counter()
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    totals[name] += ev.duration_ps / 1e9   # ms
    for name, ms in totals.items():
        # crude categorization by HLO op prefix
        base = name.split(".")[0].rstrip("0123456789")
        cat_totals[base] += ms
    return totals, cat_totals


def main():
    model = AADiffusion(cfg, dtype=jnp.bfloat16)
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

    @jax.jit
    def scan_denoise(v, x2):
        def body(carry, i):
            out = model.apply(v, carry, t2 + i, h2, c2, ctrl2,
                              method=model.denoise)
            return carry + 1e-6 * out[:, :cfg.in_channels], ()
        y, _ = jax.lax.scan(body, x2, jnp.arange(N))
        return y

    float(scan_denoise(variables, x2).sum())      # compile + warm
    trace_dir = "/tmp/diff_trace"
    with jax.profiler.trace(trace_dir):
        float(scan_denoise(variables, x2).sum())

    totals, cats = summarize(trace_dir)
    print(f"\n== top {TOP} HLO ops by device time (N={N} steps; divide by N "
          f"for per-step) ==")
    for name, ms in totals.most_common(TOP):
        print(f"{ms:8.3f} ms  {name}")
    print("\n== by op family ==")
    for name, ms in cats.most_common(20):
        print(f"{ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
