"""Component-level device-time accounting of the GPT train step (VERDICT r4 #5).

Traces ONE real Trainer.step (fwd+bwd+AdamW, same program as
BENCH_PATH=train BENCH_TRAIN_FAMILY=gpt; reference recipe
ttts/gpt/train_ms.py:216-237) on the TPU and attributes device self-time
to model components by the JAX scope names XLA preserves in the xplane
trace (event display_name), answering whether ~34% MFU is the shape's
ceiling or hides a lever:

  attention   SelfAttention_* scopes (qkv/proj matmuls + softmax attention)
  mlp         MLP_* scopes (d -> 4d -> d GEGLU-free GPT2 MLP)
  embed/head  wte/wpe/text_head/mel_head/embedding scopes
  dvae        the frozen DVAE get_codebook_indices pass inside the loss
  optimizer   AdamW/clip update ops
  other       norms, masks, loss math, unattributed fusions

Prints top ops with their scope so the categorization is auditable, then
the category table with an analytic FLOP split (attention vs MLP at these
shapes) for the MFU-per-component readout.

Run: python scripts/trace_gpt_train.py   (holds the TPU; run alone)
Env: TRACE_BS (8), TRACE_TOP (25).
"""
import collections
import glob
import os
import re
import sys
import time
import types

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_xtts"))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TOP = int(os.environ.get("TRACE_TOP", 25))


def collect(trace_dir):
    """Return [(hlo_name, display_name, ms)] for TPU 'XLA Ops' events."""
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow/"
                       "tsl/profiler/protobuf")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    rows = collections.Counter()
    disp = {}
    for p in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if "Ops" not in line.name:
                    continue
                for ev in line.events:
                    m = ev_meta[ev.metadata_id]
                    rows[m.name] += ev.duration_ps / 1e9  # ms
                    if m.display_name:
                        disp[m.name] = m.display_name
    return rows, disp


CATS = [
    ("dvae", re.compile(r"dvae|DVAE|codebook", re.I)),
    ("attention", re.compile(r"SelfAttention|/attn/|attention", re.I)),
    ("mlp", re.compile(r"MLP_|/mlp/", re.I)),
    ("embed/head", re.compile(r"wte|wpe|embed|_head|Embed", re.I)),
    ("optimizer", re.compile(r"adam|clip_by|global_norm|optax|update",
                             re.I)),
]


def categorize(name, display):
    s = display or name
    for cat, pat in CATS:
        if pat.search(s):
            return cat
    return "other"


def main():
    bs = int(os.environ.get("TRACE_BS", 8))
    from xtts_tpu.core.config import XTTSConfig
    from xtts_tpu.train.cli import build_loss
    from xtts_tpu.train.trainer import Trainer

    cfg = XTTSConfig()
    cfg = cfg.replace(train=cfg.train.replace(
        accum_grad=1, batch_size=bs, remat="none", warmup_steps=10))
    args = types.SimpleNamespace(dvae_weights=None, gpt_weights=None)
    print(f"building gpt ctx (bs={bs}) on {jax.devices()[0].platform} ...",
          flush=True)
    loss_fn, params, cols, ctx = build_loss("gpt", cfg, args)

    rng = np.random.default_rng(0)
    bins = cfg.mel.n_mels
    tlen, mlen = 150, 800

    def mel(frames):
        return jnp.asarray(
            rng.standard_normal((bs, bins, frames)).astype(np.float32) * 0.1)

    batch = {"cond_mel": mel(400), "text": jnp.asarray(
                 rng.integers(3, 250, (bs, tlen)).astype(np.int32)),
             "text_lengths": jnp.full((bs,), tlen, jnp.int32),
             "mel": mel(mlen),
             "wav_lengths": jnp.full((bs,), mlen * cfg.mel.hop_length,
                                     jnp.int32)}

    trainer = Trainer(loss_fn, cfg.train)
    state = trainer.init_state(params, cols or None)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = trainer.step(state, batch, key)
    print(f"first step (compile+run) {time.time() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)
    # warm steady-state + a wall-clock anchor for the trace total
    t0 = time.time()
    for _ in range(5):
        state, metrics = trainer.step(state, batch, key)
    float(metrics["loss"])
    wall_ms = (time.time() - t0) / 5 * 1000
    print(f"steady-state {wall_ms:.1f} ms/step (5-step wall anchor)",
          flush=True)

    trace_dir = "/tmp/gpt_train_trace"
    with jax.profiler.trace(trace_dir):
        state, metrics = trainer.step(state, batch, key)
        float(metrics["loss"])

    rows, disp = collect(trace_dir)
    total = sum(rows.values())
    print(f"\n== top {TOP} HLO ops (device total {total:.2f} ms; wall anchor "
          f"{wall_ms:.1f} ms) ==")
    for name, ms in rows.most_common(TOP):
        d = disp.get(name, "")
        print(f"{ms:8.3f} ms  {name:40s} {d[:90]}")

    cats = collections.Counter()
    for name, ms in rows.items():
        cats[categorize(name, disp.get(name, ""))] += ms
    print("\n== by component ==")
    for cat, ms in cats.most_common():
        print(f"{ms:8.3f} ms  {100*ms/total:5.1f}%  {cat}")

    # analytic FLOP split at these shapes for the MFU table
    g = cfg.gpt
    d, L = g.model_dim, g.layers
    T = tlen + mlen // 4 + 4 + 32  # text + codes + specials + cond latents
    flops_attn_mm = L * bs * T * d * d * 4 * 2      # qkv + proj
    flops_attn_sm = L * bs * T * T * d * 2 * 2      # qk^T + av
    flops_mlp = L * bs * T * d * 4 * d * 2 * 2
    fwd = flops_attn_mm + flops_attn_sm + flops_mlp
    print(f"\nanalytic (L={L}, d={d}, T~{T}, bs={bs}; fwd only, bwd ~2x):")
    print(f"  attn matmuls {flops_attn_mm/1e12:.2f} TF, attn softmax-side "
          f"{flops_attn_sm/1e12:.2f} TF, mlp {flops_mlp/1e12:.2f} TF "
          f"-> step ~{3*fwd/1e12:.2f} TF")
    print(f"  at wall {wall_ms:.1f} ms -> {3*fwd/1e9/wall_ms:.1f} TFLOP/s "
          f"= {3*fwd/1e9/wall_ms/197*100:.0f}% of v5e 197 bf16 peak")


if __name__ == "__main__":
    main()
