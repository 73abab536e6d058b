"""Pallas flash-decode attention over the KV cache.

The per-token decode attends to a preallocated (B, S_max, H, hd) cache; the
XLA einsum path reads ALL S_max positions every step and masks. This kernel
(SURVEY.md §2.4's "Pallas flash-decoding KV-cache kernel") streams only the
blocks that contain valid positions: the KV grid dimension's index_map clamps
block indices past `index` to the last valid block, and Pallas skips the DMA
when the block tuple repeats — so HBM traffic scales with the CURRENT
sequence length, not S_max. At B=8 serving the cache read is the dominant
byte stream (PERF.md), making this the difference between paying for ~450
used positions vs 904 allocated ones.

Numerics: online softmax (m/l running stats in f32, guide §2), identical to
softmax(q.K^T/sqrt(hd)) @ V over positions <= index.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_attn_kernel(idx_ref, q_ref, k_ref, v_ref, o_ref,
                        m_ref, l_ref, acc_ref, *, block: int, scale: float):
    b = pl.program_id(0)
    kv = pl.program_id(1)
    n_kv = pl.num_programs(1)
    index = idx_ref[0]
    n_valid = index // block + 1          # blocks containing valid positions

    @pl.when(kv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kv < n_valid)
    def _run():
        # single-token decode: M=1 per head, so the MXU is idle either way —
        # compute scores/PV as VPU broadcast-multiply + reductions (Mosaic
        # cannot lower head-batched dot_generals)
        q = q_ref[0].astype(jnp.float32)              # (H, hd)
        k = k_ref[0].astype(jnp.float32)              # (block, H, hd)
        v = v_ref[0].astype(jnp.float32)
        s = jnp.sum(k * q[None], axis=2) * scale       # (block, H)
        pos = kv * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=0)
        s = jnp.where(pos <= index, s, NEG_INF)
        s = s.T                                        # (H, block)

        m_prev = m_ref[:, :1]                          # (H, 1)
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)     # (H, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                        # (H, block)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)
        # o[h, d] += sum_p p[h, p] * v[p, h, d]
        pv = jnp.sum(v * p.T[:, :, None], axis=0)      # (H, hd)
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kv == n_kv - 1)
    def _store():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, index, block: int = 128,
                     interpret: bool | None = None) -> jnp.ndarray:
    """q: (B, H, hd); k_cache/v_cache: (B, S, H, hd); index: scalar int32
    (attend to positions <= index). Returns (B, H, hd) in q.dtype.

    S must be a multiple of `block` (pad the cache allocation, not the data).
    interpret defaults to True off-TPU (Pallas CPU debugging mode).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, s, h, hd = k_cache.shape
    assert s % block == 0, (s, block)
    n_kv = s // block
    scale = 1.0 / math.sqrt(hd)
    idx = jnp.reshape(jnp.asarray(index, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_kv),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda b, kv, idx: (b, 0, 0)),
            # clamp blocks past the valid range to the last valid block:
            # repeated block tuples skip the DMA (paged-attention trick)
            pl.BlockSpec((1, block, h, hd),
                         lambda b, kv, idx: (b, jnp.minimum(
                             kv, idx[0] // block), 0, 0)),
            pl.BlockSpec((1, block, h, hd),
                         lambda b, kv, idx: (b, jnp.minimum(
                             kv, idx[0] // block), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda b, kv, idx: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),   # m
            pltpu.VMEM((h, 128), jnp.float32),   # l
            pltpu.VMEM((h, hd), jnp.float32),    # acc
        ],
    )
    return pl.pallas_call(
        functools.partial(_decode_attn_kernel, block=block, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, hd), q.dtype),
        interpret=interpret,
    )(idx, q, k_cache, v_cache)


def _decode_attn_dma_kernel(idx_ref, q_ref, k_hbm, v_hbm, o_ref,
                            k_buf, v_buf, sem, *, block: int, scale: float,
                            heads: int, head_dim: int):
    """Manual double-buffered DMA variant: reads ONLY the valid prefix of the
    cache (the BlockSpec-clamp trick cannot skip DMAs whose index_map depends
    on a runtime scalar — measured no byte savings; this one scales with the
    live sequence length).

    Layout: caches arrive folded as (B, S, H*hd) so DMA slices stay
    128-lane aligned (Mosaic rejects hd=64 trailing dims). Head reductions
    run as matmuls against a constant (H*hd, H) pooling matrix — MXU-friendly
    and layout-change free.
    """
    b = pl.program_id(0)
    index = idx_ref[0]
    n_valid = index // block + 1
    d = heads * head_dim
    # pool[c, h] = 1 where channel c belongs to head h
    ch = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0) // head_dim
    hh = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
    pool = (ch == hh).astype(jnp.float32)              # (D, H)

    def dma(buf, hbm, slot, blk, sem_col):
        return pltpu.make_async_copy(
            hbm.at[b, pl.ds(blk * block, block)], buf.at[slot],
            sem.at[slot, sem_col])

    dma(k_buf, k_hbm, 0, 0, 0).start()
    dma(v_buf, v_hbm, 0, 0, 1).start()

    # dynamic sublane indexing must be 8-aligned on TPU; select row b of the
    # resident (B, D) block with a one-hot mask instead
    bsz = q_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (bsz, 1), 0)
    onehot = (row == b)
    q = jnp.sum(jnp.where(onehot, q_ref[:].astype(jnp.float32), 0.0),
                axis=0, keepdims=True)                  # (1, D) folded

    def body(blk, carry):
        m_prev, l_prev, acc = carry                    # (1,H), (1,H), (1,D)
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < n_valid)
        def _prefetch():
            dma(k_buf, k_hbm, nxt, blk + 1, 0).start()
            dma(v_buf, v_hbm, nxt, blk + 1, 1).start()

        dma(k_buf, k_hbm, slot, blk, 0).wait()
        dma(v_buf, v_hbm, slot, blk, 1).wait()
        kb = k_buf[slot].astype(jnp.float32)           # (block, D)
        vb = v_buf[slot].astype(jnp.float32)
        s = jnp.dot(kb * q, pool,
                    preferred_element_type=jnp.float32) * scale  # (block, H)
        pos = blk * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=0)
        s = jnp.where(pos <= index, s, NEG_INF)
        m_curr = jnp.max(s, axis=0, keepdims=True)     # (1, H)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                        # (block, H)
        l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
        # expand per-head weights to channels, weight V, reduce positions
        p_exp = jnp.dot(p, pool.T,
                        preferred_element_type=jnp.float32)  # (block, D)
        pv = jnp.sum(p_exp * vb, axis=0, keepdims=True)      # (1, D)
        alpha_exp = jnp.dot(alpha, pool.T,
                            preferred_element_type=jnp.float32)
        return m_next, l_next, acc * alpha_exp + pv

    m0 = jnp.full((1, heads), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((1, heads), jnp.float32)
    a0 = jnp.zeros((1, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_exp = jnp.dot(l_inv, pool.T, preferred_element_type=jnp.float32)
    result = (acc * l_inv_exp).astype(o_ref.dtype)      # (1, D)
    o_ref[:] = jnp.where(onehot, jnp.broadcast_to(result, o_ref.shape),
                         o_ref[:])


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_dma(q: jnp.ndarray, k_cache: jnp.ndarray,
                         v_cache: jnp.ndarray, index, block: int = 128,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Valid-prefix-only decode attention (manual DMA double buffering).
    Same contract as decode_attention."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, s, h, hd = k_cache.shape
    assert s % block == 0, (s, block)
    d = h * hd
    scale = 1.0 / math.sqrt(hd)
    idx = jnp.reshape(jnp.asarray(index, jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            # q is tiny: keep the whole (B, D) block in VMEM (a (1, D) block
            # would violate the 8-sublane tiling rule)
            pl.BlockSpec((bsz, d), lambda b, idx: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # k cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # v cache stays in HBM
        ],
        out_specs=pl.BlockSpec((bsz, d), lambda b, idx: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block, d), k_cache.dtype),
            pltpu.VMEM((2, block, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_attn_dma_kernel, block=block, scale=scale,
                          heads=h, head_dim=hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, d), q.dtype),
        interpret=interpret,
    )(idx, q.reshape(bsz, d), k_cache.reshape(bsz, s, d),
      v_cache.reshape(bsz, s, d))
    return out.reshape(bsz, h, hd)


def _decode_attn_batched_kernel(idx_ref, q_ref, k_hbm, v_hbm, o_ref,
                                k_buf, v_buf, sem, *, block: int,
                                scale: float, heads: int, head_dim: int,
                                bsz: int):
    """Single-instance variant: ONE strided DMA per block moves all batch
    rows together (the grid-per-b version serializes B DMA chains)."""
    index = idx_ref[0]
    n_valid = index // block + 1
    d = heads * head_dim
    ch = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 0) // head_dim
    hh = jax.lax.broadcasted_iota(jnp.int32, (d, heads), 1)
    pool = (ch == hh).astype(jnp.float32)                  # (D, H)

    def dma(buf, hbm, slot, blk, col):
        return pltpu.make_async_copy(
            hbm.at[:, pl.ds(blk * block, block)], buf.at[slot],
            sem.at[slot, col])

    dma(k_buf, k_hbm, 0, 0, 0).start()
    dma(v_buf, v_hbm, 0, 0, 1).start()
    q = q_ref[:].astype(jnp.float32)                       # (B, D)

    def body(blk, carry):
        m_prev, l_prev, acc = carry                        # (B,H),(B,H),(B,D)
        slot = jax.lax.rem(blk, 2)
        nxt = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < n_valid)
        def _prefetch():
            dma(k_buf, k_hbm, nxt, blk + 1, 0).start()
            dma(v_buf, v_hbm, nxt, blk + 1, 1).start()

        dma(k_buf, k_hbm, slot, blk, 0).wait()
        dma(v_buf, v_hbm, slot, blk, 1).wait()
        kb = k_buf[slot].astype(jnp.float32)               # (B, block, D)
        vb = v_buf[slot].astype(jnp.float32)
        prod = kb * q[:, None, :]                          # (B, block, D)
        s = jax.lax.dot_general(
            prod.reshape(bsz * block, d), pool,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (B*block, H)
        s = s.reshape(bsz, block, heads)
        pos = blk * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(pos <= index, s, NEG_INF)
        m_curr = jnp.max(s, axis=1)                        # (B, H)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, None, :])                # (B, block, H)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)
        p_exp = jax.lax.dot_general(
            p.reshape(bsz * block, heads), pool.T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(bsz, block, d)
        pv = jnp.sum(p_exp * vb, axis=1)                   # (B, D)
        alpha_exp = jax.lax.dot_general(
            alpha, pool.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (B, D)
        return m_next, l_next, acc * alpha_exp + pv

    m0 = jnp.full((bsz, heads), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bsz, heads), jnp.float32)
    a0 = jnp.zeros((bsz, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    l_inv_exp = jax.lax.dot_general(
        l_inv, pool.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc * l_inv_exp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_batched(q: jnp.ndarray, k_cache: jnp.ndarray,
                             v_cache: jnp.ndarray, index, block: int = 128,
                             interpret: bool | None = None) -> jnp.ndarray:
    """Valid-prefix decode attention, one strided DMA per block for the whole
    batch. Same contract as decode_attention."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, s, h, hd = k_cache.shape
    assert s % block == 0, (s, block)
    d = h * hd
    scale = 1.0 / math.sqrt(hd)
    idx = jnp.reshape(jnp.asarray(index, jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((bsz, d), lambda i, idx: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bsz, d), lambda i, idx: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bsz, block, d), k_cache.dtype),
            pltpu.VMEM((2, bsz, block, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_attn_batched_kernel, block=block,
                          scale=scale, heads=h, head_dim=hd, bsz=bsz),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, d), q.dtype),
        interpret=interpret,
    )(idx, q.reshape(bsz, d), k_cache.reshape(bsz, s, d),
      v_cache.reshape(bsz, s, d))
    return out.reshape(bsz, h, hd)


def decode_attention_xla(q, k_cache, v_cache, index):
    """Reference XLA implementation (the einsum path of
    nn/transformer.py SelfAttention.step) for parity tests."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) * scale
    pos = jnp.arange(k_cache.shape[1])
    logits = jnp.where((pos <= index)[None, None, :], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", w,
                      v_cache.astype(jnp.float32)).astype(q.dtype)
