"""Fused batched GPT serving decode step (int8 weights + int8 KV) — Pallas.

Motivation (PERF.md): at serving batch the XLA int8 step chain runs far off
its traffic roof (B=8, S_max=1024: 2.10 ms/step measured vs ~0.85 ms roof),
and the per-layer Pallas attention variants lose 25% in-program because 15
custom-call launches break XLA's scheduling. This kernel fuses the WHOLE
per-token step for B in {8, 16} rows into one pallas_call, combining the
two proven in-repo designs:

* the B=1 fused kernel's grouped weight-DMA ring + head-indicator-matrix
  attention (ops/decode_step.py — same stacked (T, D, D) int8 tile layout,
  so the qtree's existing "fused" stack is reused verbatim);
* the (round-2, since-deleted) flash-decode kernels' chunked cache
  streaming
  as an online-softmax loop over (B, S_chunk, D) int8 cache chunks with
  double-buffered DMAs.

The KV cache is int8 with ONE f32 scale per (layer, row, position) — unlike
infer/qdecode.QuantKVCache's per-(position, head) scales — because a scale
chunk must DMA with a 128-aligned trailing dim (CLAUDE.md): (B, Sc) f32
slices of an (L, B, S) array are aligned and tiny, while (B, Sc, H=16)
slices are not. Per-position quantization is slightly coarser; accuracy is
pinned by tests/test_serving_step.py against an exact jnp emulation and by
greedy-token agreement with the f32-cache engine.

Traffic accounting at the flagship shape (B=8, S=1008): int8 cache
15 x 2 x 8 x 1008 x 1024 = 248 MB + 190 MB int8 weights per step -> 0.54 ms
roof vs XLA's 2.10 ms measured (bf16 cache) — up to ~3x headroom. Hidden
behind XTTS_FUSED_SERVING=1 until the on-chip A/B
(scripts/ab_fused_serving.py) proves it in-program.

No reference counterpart: the reference's serving-adjacent path is HF
generate on CUDA (ttts/gpt/model.py:108-186).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xtts_tpu.ops.decode_step import GROUP, RING, _gelu_new, _ln

NEG_INF = -1e9


def _pick_chunk(b: int, d: int, s_max: int) -> int:
    """Cache-chunk length: (B, Sc, D) int8 buffer ~<= 1 MB target, but never
    below 128 — the per-position scale slices ks/vs are (B, Sc) slabs of an
    (L, B, S) f32 array, and a DMA slice's TRAILING dim must be 128-aligned
    (CLAUDE.md; Mosaic rejects Sc=64 at B=16 with "Slice shape along
    dimension 2 must be aligned to tiling (128)"). At B=16 this makes the 4
    chunk slots 8 MB and _pick_group shrinks the weight ring to fit. Also
    no longer than the (128-aligned) cache itself. XTTS_SERVING_CHUNK
    overrides (tests/perf sweeps)."""
    ov = os.environ.get("XTTS_SERVING_CHUNK")
    sc = int(ov) if ov else max(128, (1 << 20) // (b * d) // 128 * 128)
    return min(sc, -(-s_max // 128) * 128)


def _pick_group(b: int, d: int, s_chunk: int, ring: int, group: int,
                layers: int = 15, tiles: int = 12, head_tiles: int = 9) -> int:
    """Shrink the weight-DMA group until ring*group (D, D)-int8 tiles + the
    4 chunk slots + the FIXED VMEM buffers fit the 16 MB scoped-VMEM limit
    with ~2.5 MB margin for Mosaic's own stack. The fixed buffers (the
    (T, D) f32 scale/bias tables ~1.5 MB, ln tables, logits out, new-row
    outs) were originally ignored, which let the B=16 ladder-rung program
    hit `Scoped allocation ... 17.16M > 16.00M` at compile
    (measurements_r4/ab_fused_b16_ladder.log)."""
    chunk_mb = 4 * b * s_chunk * d / (1 << 20)
    t = layers * tiles + 9  # stacked tile count incl. head tiles (qdecode)
    fixed_mb = (
        2 * t * d * 4                # s_ref/b_ref (T, D) f32
        + layers * 4 * d * 4         # ln (L, 4, D) f32
        + 4 * d * 4                  # lnf
        + b * head_tiles * d * 4     # logits out
        + 2 * layers * b * d         # krows/vrows int8
        + 4 * b * s_chunk * 4        # k/v scale slots (2 x 2 slots) f32
    ) / (1 << 20)
    tile_mb = d * d / (1 << 20)
    # 14.5: keeps the measured B=8 winner at group=4 (est. 14.36 MB, known
    # to compile) and drops B=16 from group=2 (est. 14.92 MB — the shape
    # that OOM'd in the ladder-rung program) to group=1 (est. 12.92 MB)
    g = group
    while g > 1 and ring * g * tile_mb + chunk_mb + fixed_mb > 14.5:
        g //= 2
    return g


def _make_serving_kernel(layers: int, d: int, heads: int, s_max: int,
                         b: int, head_tiles: int, group: int, ring: int,
                         s_chunk: int):
    hd = d // heads
    att_scale = 1.0 / np.sqrt(hd)
    tiles_per_layer = 12
    n_chunks = -(-s_max // s_chunk)

    def kernel(idx_ref,                  # (1,) int32 scalar prefetch
               x_ref,                    # (B, D) bf16
               ln_ref,                   # (L, 4, D) f32
               w_ref,                    # HBM (T, D, D) int8
               s_ref, b_ref,             # (T, D) f32
               lnf_ref,                  # (4, D) f32
               kc_ref, vc_ref,           # HBM (L, B, S, D) int8
               ks_ref, vs_ref,           # HBM (L, B, S) f32 per-position
               logits_ref,               # (B, HT*D) f32 out
               krows_ref, vrows_ref,     # (L, B, D) int8 new-row outs
               kssc_ref, vssc_ref,       # (L, B) f32 new-row scales
               wbuf,                     # (ring, group, D, D) int8
               kbuf, vbuf,               # (2, B, Sc, D) int8 chunk slots
               ksb, vsb,                 # (2, B, Sc) f32 scale slots
               wsem, csem):
        idx = idx_ref[0]
        n_tiles = layers * tiles_per_layer + head_tiles
        n_groups = -(-n_tiles // group)

        def w_dma(g: int):
            start = g * group
            size = min(group, n_tiles - start)
            if size == group:
                return pltpu.make_async_copy(
                    w_ref.at[pl.ds(start, group)], wbuf.at[g % ring],
                    wsem.at[g % ring])
            return pltpu.make_async_copy(
                w_ref.at[pl.ds(start, size)],
                wbuf.at[g % ring, pl.ds(0, size)], wsem.at[g % ring])

        def chunk_dma(gidx: int):
            """The cache chunks form ONE flat ping-pong sequence across
            layers: global index gidx = li * n_chunks + c uses slot
            gidx % 2, so a slot is always re-filled exactly two consumptions
            after its last use regardless of chunk-count parity. Chunks are
            full-Sc (S padded to a chunk multiple by the caller; reads past
            idx are masked)."""
            li, c = divmod(gidx, n_chunks)
            slot = gidx % 2
            s0 = c * s_chunk
            return (
                pltpu.make_async_copy(
                    kc_ref.at[li, :, pl.ds(s0, s_chunk)], kbuf.at[slot],
                    csem.at[slot, 0]),
                pltpu.make_async_copy(
                    vc_ref.at[li, :, pl.ds(s0, s_chunk)], vbuf.at[slot],
                    csem.at[slot, 1]),
                pltpu.make_async_copy(
                    ks_ref.at[li, :, pl.ds(s0, s_chunk)], ksb.at[slot],
                    csem.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_ref.at[li, :, pl.ds(s0, s_chunk)], vsb.at[slot],
                    csem.at[slot, 3]),
            )

        total_chunks = layers * n_chunks
        for g in range(min(ring - 1, n_groups)):
            w_dma(g).start()
        for gidx in range(min(2, total_chunks)):
            for dma in chunk_dma(gidx):
                dma.start()

        # head-indicator matrix: G[c, h] = (c // hd == h)
        lane = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0) // hd
        head_id = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
        g_dn = (lane == head_id).astype(jnp.bfloat16)              # (D, H)

        step = [0]

        def tile(x_in):
            """(B, D) bf16 @ int8 tile -> (B, D) f32 (dequant matmul)."""
            t = step[0]
            g, j = divmod(t, group)
            if j == 0:
                w_dma(g).wait()
                if g + ring - 1 < n_groups:
                    w_dma(g + ring - 1).start()
            w = wbuf[g % ring, j].astype(jnp.bfloat16)
            y = (jnp.dot(x_in, w, preferred_element_type=jnp.float32)
                 * s_ref[t][None, :] + b_ref[t][None, :])
            step[0] = t + 1
            return y

        def quant_rows(y):
            """(B, D) f32 -> (int8 rows, (B, 1) f32 per-row scales)."""
            sc = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True),
                             1e-8) / 127.0
            q = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
            return q, sc

        x = x_ref[:].astype(jnp.float32)                           # (B, D)
        for li in range(layers):
            h = _ln(x, ln_ref[li, 0], ln_ref[li, 1]).astype(jnp.bfloat16)
            q = tile(h)
            knew = tile(h)
            vnew = tile(h)
            kq, ks_new = quant_rows(knew)
            vq, vs_new = quant_rows(vnew)
            krows_ref[li] = kq
            vrows_ref[li] = vq
            kssc_ref[li] = ks_new[:, 0]
            vssc_ref[li] = vs_new[:, 0]

            # ---- chunked online-softmax attention over the int8 cache ----
            # all head-axis <-> feature-axis broadcasts go through the
            # indicator matrix on the MXU (no (S, H, hd) reshapes / repeats
            # — Mosaic cannot retile 64-lane groups, CLAUDE.md)
            g_up = g_dn.T.astype(jnp.float32)                      # (H, D)
            qb = q.astype(jnp.bfloat16)                            # (B, D)
            m = jnp.full((b, heads), NEG_INF, jnp.float32)
            den = jnp.zeros((b, heads), jnp.float32)
            acc = jnp.zeros((b, d), jnp.float32)
            for c in range(n_chunks):
                gidx = li * n_chunks + c
                slot = gidx % 2
                for dma in chunk_dma(gidx):
                    dma.wait()
                pos0 = c * s_chunk
                pos = pos0 + jax.lax.broadcasted_iota(
                    jnp.int32, (s_chunk, heads), 0)
                valid = pos < idx                                  # (Sc, H)
                m_rows, den_rows, acc_rows = [], [], []
                for r in range(b):
                    kc_r = kbuf[slot, r].astype(jnp.bfloat16)      # (Sc, D)
                    sc_k = ksb[slot, r][:, None]                   # (Sc, 1)
                    scores = jnp.dot(kc_r * qb[r:r + 1], g_dn,
                                     preferred_element_type=jnp.float32)
                    scores = scores * (sc_k * att_scale)           # (Sc, H)
                    scores = jnp.where(valid, scores, NEG_INF)
                    m_new = jnp.maximum(
                        m[r:r + 1],
                        jnp.max(scores, axis=0, keepdims=True))    # (1, H)
                    alpha = jnp.exp(m[r:r + 1] - m_new)            # (1, H)
                    e = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
                    den_r = (den[r:r + 1] * alpha
                             + jnp.sum(e, axis=0, keepdims=True))
                    # v dequant folded: acc += sum_s e[s, h(col)] * v[s, col]
                    #                   * vscale[s]
                    wts_d = jnp.dot(e.astype(jnp.bfloat16), g_dn.T,
                                    preferred_element_type=jnp.float32)
                    vc_r = vbuf[slot, r].astype(jnp.float32)       # (Sc, D)
                    contrib = jnp.sum(
                        vc_r * wts_d * vsb[slot, r][:, None], axis=0,
                        keepdims=True)                             # (1, D)
                    alpha_d = jnp.dot(alpha, g_up,
                                      preferred_element_type=jnp.float32)
                    acc_rows.append(acc[r:r + 1] * alpha_d + contrib)
                    m_rows.append(m_new)
                    den_rows.append(den_r)
                m = jnp.concatenate(m_rows, axis=0)                # (B, H)
                den = jnp.concatenate(den_rows, axis=0)
                acc = jnp.concatenate(acc_rows, axis=0)            # (B, D)
                # slot consumed — start the DMA two consumptions ahead
                if gidx + 2 < total_chunks:
                    for dma in chunk_dma(gidx + 2):
                        dma.start()

            # current token's own k/v (exact, not quantized): closed form
            self_s = jnp.dot((knew * q).astype(jnp.bfloat16), g_dn,
                             preferred_element_type=jnp.float32
                             ) * att_scale                         # (B, H)
            m_new = jnp.maximum(m, self_s)
            alpha = jnp.exp(m - m_new)
            e_self = jnp.exp(self_s - m_new)                       # (B, H)
            den = den * alpha + e_self
            acc = (acc * jnp.dot(alpha, g_up)
                   + jnp.dot(e_self, g_up) * vnew)
            att = acc / jnp.dot(den, g_up)                         # (B, D)

            x = x + tile(att.astype(jnp.bfloat16))                 # proj
            h2 = _ln(x, ln_ref[li, 2], ln_ref[li, 3]).astype(jnp.bfloat16)
            acc_m = None
            for _ in range(4):                                     # fc/out
                mact = _gelu_new(tile(h2)).astype(jnp.bfloat16)
                part = tile(mact)
                acc_m = part if acc_m is None else acc_m + part
            x = x + acc_m

        x = _ln(x, lnf_ref[0], lnf_ref[1])                         # ln_f
        x = _ln(x, lnf_ref[2], lnf_ref[3])                         # final_norm
        xh = x.astype(jnp.bfloat16)
        for ti in range(head_tiles):
            logits_ref[:, ti * d:(ti + 1) * d] = tile(xh)

    return kernel


def fused_serving_logits(stacked: Dict[str, jnp.ndarray], x: jnp.ndarray,
                         kc, vc, ks, vs, index,
                         layers: int, heads: int,
                         interpret: bool | None = None,
                         group: int | None = None, ring: int | None = None):
    """One fused serving step: (B, D) token hiddens -> (B, HT*D) logits.

    kc/vc: (L, B, S, D) int8; ks/vs: (L, B, S) f32 per-position scales
    (S padded to a chunk multiple — see _pick_chunk). Returns
    (logits, kc, vc, ks, vs) with the new rows inserted at `index`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    head_tiles = int(stacked["head_tiles"])
    return _fused_serving_logits(
        {k: v for k, v in stacked.items()
         if k not in ("head_tiles", "vocab", "pmat")},
        x, kc, vc, ks, vs, index, layers=layers, heads=heads,
        head_tiles=head_tiles, interpret=interpret,
        group=group or GROUP, ring=ring or RING)


@functools.partial(jax.jit,
                   static_argnames=("layers", "heads", "head_tiles",
                                    "interpret", "group", "ring"))
def _fused_serving_logits(stacked, x, kc, vc, ks, vs, index, layers, heads,
                          head_tiles, interpret, group=GROUP, ring=RING):
    b, d = x.shape
    s_max = kc.shape[2]
    s_chunk = _pick_chunk(b, d, s_max)
    assert s_max % s_chunk == 0, (s_max, s_chunk)
    group = _pick_group(b, d, s_chunk, ring, group,
                        layers=layers, head_tiles=head_tiles)
    kern = _make_serving_kernel(layers, d, heads, s_max, b, head_tiles,
                                group, ring, s_chunk)
    idx = jnp.asarray(index, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln
            pl.BlockSpec(memory_space=pl.ANY),       # w tiles (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # biases
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lnf
            pl.BlockSpec(memory_space=pl.ANY),       # kc
            pl.BlockSpec(memory_space=pl.ANY),       # vc
            pl.BlockSpec(memory_space=pl.ANY),       # ks
            pl.BlockSpec(memory_space=pl.ANY),       # vs
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[
            pltpu.VMEM((ring, group, d, d), jnp.int8),
            pltpu.VMEM((2, b, s_chunk, d), jnp.int8),   # k chunk slots
            pltpu.VMEM((2, b, s_chunk, d), jnp.int8),   # v chunk slots
            pltpu.VMEM((2, b, s_chunk), jnp.float32),   # k scale slots
            pltpu.VMEM((2, b, s_chunk), jnp.float32),   # v scale slots
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    logits, krows, vrows, ksr, vsr = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, head_tiles * d), jnp.float32),
            jax.ShapeDtypeStruct((layers, b, d), jnp.int8),
            jax.ShapeDtypeStruct((layers, b, d), jnp.int8),
            jax.ShapeDtypeStruct((layers, b), jnp.float32),
            jax.ShapeDtypeStruct((layers, b), jnp.float32),
        ],
        interpret=interpret,
    )(idx, x.astype(jnp.bfloat16), stacked["ln"], stacked["w"], stacked["s"],
      stacked["b"], stacked["lnf"], kc, vc, ks, vs)

    kc = jax.lax.dynamic_update_slice(kc, krows[:, :, None], (0, 0, index, 0))
    vc = jax.lax.dynamic_update_slice(vc, vrows[:, :, None], (0, 0, index, 0))
    ks = jax.lax.dynamic_update_slice(ks, ksr[:, :, None], (0, 0, index))
    vs = jax.lax.dynamic_update_slice(vs, vsr[:, :, None], (0, 0, index))
    return logits, kc, vc, ks, vs


def quantize_kv_rowwise(cache, s_pad: int) -> Tuple[jnp.ndarray, ...]:
    """(L, B, S, H, hd) bf16/f32 KVCache -> the kernel's int8 layout:
    (L, B, S_pad, D) int8 + (L, B, S_pad) f32 per-POSITION scales
    (S zero-padded up to s_pad, a chunk multiple)."""
    def quant(a):
        l, b, s, h, hd = a.shape
        rows = a.astype(jnp.float32).reshape(l, b, s, h * hd)
        sc = jnp.maximum(jnp.max(jnp.abs(rows), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(rows / sc[..., None]), -127,
                     127).astype(jnp.int8)
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        return jnp.pad(q, pad), jnp.pad(sc, pad[:-1])

    kq, ksc = quant(cache.k)
    vq, vsc = quant(cache.v)
    return kq, vq, ksc, vsc
