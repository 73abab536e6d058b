"""Fused single-launch GPT decode step (int8 weights) — Pallas TPU kernel.

Motivation (PERF.md round 2): the XLA B=1 int8-dequant matvec chain streams
weights at only ~344 GB/s (42% of the v5e HBM roof); bf16 manages 490 GB/s
and W8A8 is worse still — the M=1 decode step is launch/fusion-bound, not
compute-bound. This kernel executes the ENTIRE per-token transformer step
(15 layers + ln_f + mel_head) in ONE pallas_call:

  per layer: LN1 -> q/k/v matvecs -> KV-cache attention -> proj
             -> LN2 -> fc -> gelu_new -> out (accumulated K-splits)
  then ln_f -> final_norm is left outside -> mel_head tiles.

Design:
* every weight matrix is pre-cut into uniform (D, D) int8 tiles stacked as
  one (T, D, D) HBM array (qkv=3 N-tiles, proj=1, fc=4 N-tiles, out=4
  K-tiles accumulated, mel_head=9 N-tiles incl. padding) with matching
  (T, D) f32 scale/bias rows; a 4-slot VMEM ring double-buffers the tile
  DMAs so dequant+matvec of tile t overlaps the DMA of t+2..t+3;
* dequant int8->bf16 on the VPU feeds (8, D) x (D, D) MXU matvecs (the
  single live row is broadcast to 8 sublanes);
* attention uses the MXU for head-group reductions: scores = (k ⊙ q) @ G
  and the V-sum uses G^T, where G is the (D, H) head-indicator matrix —
  no (S, H, hd) reshapes (Mosaic cannot retile 64-lane groups);
* the new token's k/v row DMAs straight into the HBM cache at the
  scalar-prefetched dynamic position; the VMEM cache copy is never mutated —
  the current token's attention term is added in closed form;
* LayerNorms/softmax in f32, residual bf16 — matching xtts_tpu/infer/qdecode
  numerics (greedy tokens agree with the XLA engine).

Single-sequence (B=1): this is the latency-floor path (the reference hot
loop, ttts/gpt/model.py:108-186). Batched serving keeps the XLA engine.
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

NEG_INF = -1e9
# The weight stream is issued as GROUP consecutive (D, D) tiles per DMA
# (one contiguous GROUP-MB transfer); RING counts in-flight groups. Measured
# at the flagship shape (N=400 scan, fixed-cost corrected): per-DMA issue
# overhead ~0.5 us makes grouping matter — G1 0.453, G2 0.409 ms/step.
# VMEM budget: ring = RING*GROUP MB int8 + ~5.2 MB cache/aux at S_max=640;
# GROUP*RING <= 8 stays under the 16 MB scoped-vmem limit.
GROUP = int(os.environ.get("XTTS_DECODE_GROUP", 4))
RING = int(os.environ.get("XTTS_DECODE_RING", 2))


def _ln(x32, scale, bias):
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _gelu_new(x):
    """HF gelu_new (tanh approximation) in f32."""
    c = np.float32(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


def _make_kernel(layers: int, d: int, heads: int, s_max: int,
                 head_tiles: int, group: int, ring: int, wbits: int = 8):
    hd = d // heads
    att_scale = 1.0 / np.sqrt(hd)
    tiles_per_layer = 12  # q, k, v, proj, (fc, out) x 4
    GROUP, RING = group, ring
    skip_attn = os.environ.get("XTTS_DECODE_SKIP_ATTN") == "1"  # ablation
    w8a8 = os.environ.get("XTTS_DECODE_W8A8") == "1"  # int8-MXU experiment
    skip_mm = os.environ.get("XTTS_DECODE_SKIP_MM") == "1"  # DMA-floor ablation

    def kernel(idx_ref,                       # scalar prefetch (1,) int32
               x_ref,                         # (8, D) bf16 (row 0 live)
               ln_ref,                        # (L, 4, D) f32 (ln1 s/b, ln2 s/b)
               w_ref,                         # HBM (T, D, D) int8
                                              #   int4: (T, D, D/2) packed
               s_ref,                         # (T, D) f32 tile scales
               b_ref,                         # (T, D) f32 tile biases
               lnf_ref,                       # (4, D) f32 (ln_f s/b, final s/b)
               kc_ref, vc_ref,                # HBM (L, S, D) bf16
               pmat_ref,                      # (D, D) bf16 even||odd -> canon
                                              #   permutation (int4 only;
                                              #   (8,128) dummy for int8)
               logits_ref,                    # (8, HT*D) f32 out
               krows_ref, vrows_ref,          # (L, 8, D) bf16 new-row outs
               wbuf, kbuf, vbuf,              # scratch
               wsem, csem):
        idx = idx_ref[0]
        n_tiles = layers * tiles_per_layer + head_tiles
        n_groups = -(-n_tiles // GROUP)

        def w_dma(g: int):
            start = g * GROUP
            size = min(GROUP, n_tiles - start)
            if size == GROUP:
                return pltpu.make_async_copy(
                    w_ref.at[pl.ds(start, GROUP)], wbuf.at[g % RING],
                    wsem.at[g % RING])
            return pltpu.make_async_copy(
                w_ref.at[pl.ds(start, size)],
                wbuf.at[g % RING, pl.ds(0, size)], wsem.at[g % RING])

        def cache_dma(li: int):
            # single-slot cache buffers: the next layer's DMA starts only
            # after this layer's attention has consumed the buffer — the MLP
            # weight stream (~8 tiles) that follows hides it completely,
            # and the freed VMEM (2.6 MB) buys a deeper weight-group ring
            return (pltpu.make_async_copy(kc_ref.at[li], kbuf, csem.at[0]),
                    pltpu.make_async_copy(vc_ref.at[li], vbuf, csem.at[1]))

        for g in range(min(RING - 1, n_groups)):
            w_dma(g).start()
        for dma in cache_dma(0):
            dma.start()

        # head-indicator matrix for group sums: G[c, h] = (c // hd == h)
        lane = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0) // hd
        head_id = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
        g_dn = (lane == head_id).astype(jnp.bfloat16)            # (D, H)
        pos = jax.lax.broadcasted_iota(jnp.int32, (s_max, heads), 0)
        key_valid = pos < idx                                    # (S, H)

        step = [0]  # python box so tile() can advance it during unroll

        def tile(x_in, xq=None, canon=True):
            """x_in (8, D) bf16 -> (8, D) f32 = x_in @ deq(W_t) * s + b.

            w8a8 mode: xq = (int8 rows, f32 scalar scale) precomputed once
            per distinct input — the matmul runs on the int8 MXU path (2x
            throughput, no dequant convert on the VPU).

            int4 mode: two nibbles per byte hold output columns (2j, 2j+1);
            the unpacked matmul yields [even cols ; odd cols] with
            pre-permuted scales/bias. canon=True restores canonical order
            via one MXU matmul with the constant permutation matrix;
            canon=False (fc tiles) leaves it permuted — the consumer (gelu
            is elementwise, the out tile's rows are pre-permuted at pack
            time) never notices.
            """
            t = step[0]
            g, j = divmod(t, GROUP)
            if j == 0:
                w_dma(g).wait()
                if g + RING - 1 < n_groups:
                    w_dma(g + RING - 1).start()
            if skip_mm:  # ablation: DMA chain only (sum keeps the read live)
                y = (jnp.sum(wbuf[g % RING, j][:8].astype(jnp.float32),
                             axis=0, keepdims=True) * 1e-6
                     + b_ref[t][None, :])
                y = jnp.broadcast_to(y, (8, d))
            elif wbits == 4:
                # int8 shifts don't legalize in Mosaic (arith.shli) — widen
                b32 = wbuf[g % RING, j].astype(jnp.int32)    # (D, D/2)
                lo = ((b32 << 28) >> 28).astype(jnp.bfloat16)  # cols 0,2,..
                hi = (b32 >> 4).astype(jnp.bfloat16)           # cols 1,3,..
                w = jnp.concatenate([lo, hi], axis=-1)       # even||odd
                y = (jnp.dot(x_in, w, preferred_element_type=jnp.float32)
                     * s_ref[t][None, :] + b_ref[t][None, :])
                if canon:
                    y = jnp.dot(y.astype(jnp.bfloat16), pmat_ref[:],
                                preferred_element_type=jnp.float32)
            elif w8a8 and xq is not None:
                xi, xs = xq
                y = jnp.dot(xi, wbuf[g % RING, j],
                            preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * (s_ref[t][None, :] * xs)
                     + b_ref[t][None, :])
            else:
                w = wbuf[g % RING, j].astype(jnp.bfloat16)
                y = (jnp.dot(x_in, w, preferred_element_type=jnp.float32)
                     * s_ref[t][None, :] + b_ref[t][None, :])
            step[0] = t + 1
            return y

        def quant_rows(h):
            """(8, D) -> (int8 rows, f32 scalar scale) for the w8a8 path."""
            if not w8a8:
                return None
            h32 = h.astype(jnp.float32)
            xs = jnp.maximum(jnp.max(jnp.abs(h32)), 1e-6) / 127.0
            xi = jnp.clip(jnp.round(h32 / xs), -127, 127).astype(jnp.int8)
            return xi, xs

        x = x_ref[:].astype(jnp.float32)                         # (8, D)
        for li in range(layers):
            h = _ln(x, ln_ref[li, 0], ln_ref[li, 1]).astype(jnp.bfloat16)
            hq = quant_rows(h)
            q = tile(h, hq)
            knew = tile(h, hq)
            vnew = tile(h, hq)

            # export the new k/v row (the caller inserts it at position idx
            # with an XLA dynamic_update_slice — a sublane-1 DMA at a dynamic
            # offset is not expressible in Mosaic, CLAUDE.md gotchas)
            krows_ref[li] = knew.astype(jnp.bfloat16)
            vrows_ref[li] = vnew.astype(jnp.bfloat16)

            # ---- attention over the cached prefix + the new token ----
            kd, vd = cache_dma(li)
            kd.wait()
            vd.wait()
            if skip_attn:  # ablation: pipeline floor without attention math
                if li + 1 < layers:
                    for dma in cache_dma(li + 1):
                        dma.start()
                att_b = q.astype(jnp.bfloat16)
                x = x + tile(att_b, quant_rows(att_b))
                h2 = _ln(x, ln_ref[li, 2], ln_ref[li, 3]).astype(jnp.bfloat16)
                h2q = quant_rows(h2)
                acc = None
                for _ in range(4):
                    mact = _gelu_new(tile(h2, h2q, canon=False)
                                     ).astype(jnp.bfloat16)
                    part = tile(mact, quant_rows(mact))
                    acc = part if acc is None else acc + part
                x = x + acc
                continue
            qb = q[:1].astype(jnp.bfloat16)                      # (1, D)
            kc = kbuf[:]                                         # (S, D)
            vc = vbuf[:]
            scores = jnp.dot(kc * qb, g_dn,
                             preferred_element_type=jnp.float32) * att_scale
            self_s = jnp.dot(knew[:1].astype(jnp.bfloat16) * qb, g_dn,
                             preferred_element_type=jnp.float32) * att_scale
            scores = jnp.where(key_valid, scores, NEG_INF)       # (S, H)
            m = jnp.maximum(jnp.max(scores, axis=0, keepdims=True), self_s)
            e = jnp.where(key_valid, jnp.exp(scores - m), 0.0)
            e_self = jnp.exp(self_s - m)                         # (1, H)
            denom = jnp.sum(e, axis=0, keepdims=True) + e_self
            wts = (e / denom).astype(jnp.bfloat16)               # (S, H)
            wts_d = jnp.dot(wts, g_dn.T,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)                # (S, D)
            att = jnp.sum((vc * wts_d).astype(jnp.float32), axis=0,
                          keepdims=True)
            att = att + (jnp.dot((e_self / denom).astype(jnp.float32),
                                 g_dn.T.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                         * vnew[:1])
            att_b = jnp.broadcast_to(att, (8, d)).astype(jnp.bfloat16)
            # cache buffers consumed — safe to start the next layer's DMA
            if li + 1 < layers:
                for dma in cache_dma(li + 1):
                    dma.start()

            x = x + tile(att_b, quant_rows(att_b))               # proj

            h2 = _ln(x, ln_ref[li, 2], ln_ref[li, 3]).astype(jnp.bfloat16)
            h2q = quant_rows(h2)
            acc = None
            for _ in range(4):                                   # fc/out
                mact = _gelu_new(tile(h2, h2q, canon=False)
                                 ).astype(jnp.bfloat16)
                part = tile(mact, quant_rows(mact))
                acc = part if acc is None else acc + part
            x = x + acc

        x = _ln(x, lnf_ref[0], lnf_ref[1])                       # ln_f
        x = _ln(x, lnf_ref[2], lnf_ref[3])                       # final_norm
        xh = x.astype(jnp.bfloat16)
        xhq = quant_rows(xh)
        for ti in range(head_tiles):
            logits_ref[:, ti * d:(ti + 1) * d] = tile(xh, xhq)

    return kernel


def fused_decode_logits(stacked: Dict[str, jnp.ndarray], x: jnp.ndarray,
                        kc: jnp.ndarray, vc: jnp.ndarray, index,
                        layers: int, heads: int,
                        interpret: bool | None = None,
                        group: int | None = None, ring: int | None = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused decode step: token hidden -> mel-head logits.

    stacked: tree from stack_qtree(); x: (1, D) token embedding (mel emb +
    pos emb); kc/vc: (L, S, D) bf16 caches; index: absolute position of this
    token. Returns (logits (1, head_tiles*D) f32 — slice to vocab outside,
    kc, vc).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    head_tiles = int(stacked["head_tiles"])
    return _fused_decode_logits(
        {k: v for k, v in stacked.items() if k not in ("head_tiles", "vocab")},
        x, kc, vc, index, layers=layers, heads=heads, head_tiles=head_tiles,
        interpret=interpret, group=group or GROUP, ring=ring or RING)


@functools.partial(jax.jit,
                   static_argnames=("layers", "heads", "head_tiles",
                                    "interpret", "group", "ring"))
def _fused_decode_logits(stacked, x, kc, vc, index, layers, heads,
                         head_tiles, interpret, group=GROUP, ring=RING):
    d = x.shape[-1]
    s_max = kc.shape[1]
    # int4 stacks carry (T, D, D/2) packed bytes + the permutation matrix
    wbits = 4 if stacked["w"].shape[-1] == d // 2 else 8
    pmat = stacked.get("pmat", jnp.zeros((8, 128), jnp.bfloat16))
    kern = _make_kernel(layers, d, heads, s_max, head_tiles, group, ring,
                        wbits=wbits)
    x8 = jnp.broadcast_to(x.astype(jnp.bfloat16), (8, d))
    idx = jnp.asarray(index, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln
            pl.BlockSpec(memory_space=pl.ANY),    # w tiles (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # biases
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lnf
            pl.BlockSpec(memory_space=pl.ANY),    # kc
            pl.BlockSpec(memory_space=pl.ANY),    # vc
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pmat
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # logits
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k new rows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v new rows
        ],
        scratch_shapes=[
            pltpu.VMEM((ring, group, d, d // (2 if wbits == 4 else 1)),
                       jnp.int8),                # weight-group ring
            pltpu.VMEM((s_max, d), jnp.bfloat16),  # k cache buf (single slot)
            pltpu.VMEM((s_max, d), jnp.bfloat16),  # v cache buf
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    logits, krows, vrows = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, head_tiles * d), jnp.float32),
            jax.ShapeDtypeStruct((layers, 8, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((layers, 8, d), jnp.bfloat16),
        ],
        interpret=interpret,
    )(idx, x8, stacked["ln"], stacked["w"], stacked["s"], stacked["b"],
      stacked["lnf"], kc, vc, pmat)
    # insert the new rows at the dynamic position via XLA (in-place with
    # donation; ~61 KB per step — negligible vs the 200 MB weight stream)
    kc2 = jax.lax.dynamic_update_slice(
        kc, krows[:, :1, :].astype(kc.dtype), (0, index, 0))
    vc2 = jax.lax.dynamic_update_slice(
        vc, vrows[:, :1, :].astype(vc.dtype), (0, index, 0))
    return logits[:1], kc2, vc2


def stack_qtree(qt: Dict[str, Any], vocab: int) -> Dict[str, Any]:
    """qdecode quantized tree -> uniform (D, D)-tile arrays for the fused
    kernel. Padded mel-head columns get scale 0 / bias NEG_INF so sampling
    can never pick them."""
    ls = qt["layers"]
    d = ls[0]["qkv"]["w"].shape[0]
    tiles, scales, biases = [], [], []

    def add(w, s, b):
        tiles.append(w)
        scales.append(jnp.asarray(s, jnp.float32))
        biases.append(jnp.asarray(b, jnp.float32))

    for l in ls:
        for i in range(3):                       # q, k, v
            sl = slice(i * d, (i + 1) * d)
            add(l["qkv"]["w"][:, sl], l["qkv"]["scale"][sl], l["qkv_b"][sl])
        add(l["proj"]["w"], l["proj"]["scale"], l["proj_b"])
        for i in range(4):                       # interleaved fc_i, out_i
            sl = slice(i * d, (i + 1) * d)
            add(l["fc"]["w"][:, sl], l["fc"]["scale"][sl], l["fc_b"][sl])
            add(l["out"]["w"][sl, :], l["out"]["scale"],
                l["out_b"] if i == 0 else jnp.zeros((d,), jnp.float32))

    hw, hs = qt["mel_head"]["w"], qt["mel_head"]["scale"]
    hb = qt["mel_head_b"]
    head_tiles = -(-vocab // d)
    pad = head_tiles * d - vocab
    hw = jnp.pad(hw, ((0, 0), (0, pad)))
    hs = jnp.pad(hs, (0, pad))
    hb = jnp.pad(hb, (0, pad), constant_values=NEG_INF)
    for i in range(head_tiles):
        sl = slice(i * d, (i + 1) * d)
        add(hw[:, sl], hs[sl], hb[sl])

    ln = jnp.stack([
        jnp.stack([l["ln_1"]["scale"], l["ln_1"]["bias"],
                   l["ln_2"]["scale"], l["ln_2"]["bias"]]) for l in ls
    ]).astype(jnp.float32)
    lnf = jnp.stack([
        qt["ln_f"]["scale"], qt["ln_f"]["bias"],
        qt["final_norm"]["scale"], qt["final_norm"]["bias"],
    ]).astype(jnp.float32)

    return {
        "w": jnp.stack(tiles),
        "s": jnp.stack(scales),
        "b": jnp.stack(biases),
        "ln": ln,
        "lnf": lnf,
        "head_tiles": head_tiles,
        "vocab": vocab,
    }


def stack_qtree_int4(qt: Dict[str, Any], vocab: int) -> Dict[str, Any]:
    """int8 stacked tree -> packed int4 stack: halves the weight stream to
    ~95 MB/token. Per-output-channel symmetric int4 (re-quantized from the
    dequantized int8 weights); output columns stored even||odd so two
    nibbles/byte unpack with shifts only. Scales/biases stored permuted;
    out-tile ROWS pre-permuted so the (permuted) fc hidden feeds them
    directly; `pmat` restores canonical order for q/k/v/proj/out/head
    outputs via one MXU matmul per tile (see _make_kernel int4 mode).

    Quality note: int4 is a lossier opt-in speed mode (XTTS_DECODE_BITS=4) —
    greedy chains diverge from the int8 engine earlier; top-p sampling paths
    are the intended consumer."""
    st = stack_qtree(qt, vocab)
    w8, s8, b = st["w"], st["s"], st["b"]
    T, d, _ = w8.shape
    W = w8.astype(jnp.float32) * s8[:, None, :]
    s4 = jnp.maximum(jnp.max(jnp.abs(W), axis=1), 1e-8) / 7.0    # (T, D)
    w4 = jnp.clip(jnp.round(W / s4[:, None, :]), -7, 7).astype(jnp.int32)

    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    w4 = w4[:, :, perm]
    s4 = s4[:, perm]
    bp = b[:, perm]
    # out tiles consume the PERMUTED fc hidden -> pre-permute their rows
    layers = (T - int(st["head_tiles"])) // 12
    out_idx = jnp.asarray([li * 12 + ti for li in range(layers)
                           for ti in (5, 7, 9, 11)])
    w4 = w4.at[out_idx].set(w4[out_idx][:, perm, :])

    lo = w4[:, :, :d // 2].astype(jnp.uint8) & 0xF
    hi = w4[:, :, d // 2:].astype(jnp.uint8) & 0xF
    packed = ((hi << 4) | lo).astype(jnp.int8)

    pmat = np.zeros((d, d), np.float32)
    pmat[np.arange(d), perm] = 1.0               # y_canon = y_perm @ pmat

    out = dict(st)
    out.update(w=packed, s=s4, b=bp,
               pmat=jnp.asarray(pmat, jnp.bfloat16))
    return out
