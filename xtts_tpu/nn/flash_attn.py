"""Flash (online-softmax) attention for the diffusion UNet's big
self-attention, via JAX's in-tree Pallas TPU kernel.

Why: the render profile (PERF.md round-5 phase 17) shows the
SpatialTransformer self-attention over [x ; refer] is ~51% of the B=16
denoise step at ~21% MFU — bandwidth-bound on materializing the
(B, H, Tq, Tk) score matrix (~15 GB/step of HBM traffic at serving
shapes). The flash kernel keeps score tiles in VMEM (never materializes
the full matrix), turning the op compute-bound. Math is exact attention
(f32 online softmax) — outputs differ from the einsum path only by
summation order (ULP-level), the same class of difference as any XLA
fusion change; the mel-L1 fidelity axis is unaffected.

The kernel requires seq lengths divisible by its block sizes, so
`flash_mha` pads Tq/Tk up to block multiples, masks the padded KV rows
with `SegmentIds` (id 1 = padding; queries of id 0 cannot attend), and
slices the Q padding off the output. The pad/mask/slice logic is core-
pluggable: `core="reference"` runs a plain-einsum core with identical
padding semantics, which (a) unit-tests the wrapper on CPU where Mosaic
kernels cannot run, and (b) serves as the numerics baseline for the
on-chip A/B (`scripts/ab_flash_attn.py`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_blocks(t_pad: int, choices=(512, 256, 128)) -> int:
    for c in choices:
        if t_pad % c == 0:
            return c
    return 128


def _reference_core(q, k, v, sm_scale, segment_ids):
    """Plain-einsum attention with the SAME segment masking semantics as
    the kernel ((B,H,T,dh) layout) — the CPU test/baseline core."""
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * sm_scale
    if segment_ids is not None:
        q_ids, kv_ids = segment_ids
        mask = q_ids[:, None, :, None] == kv_ids[:, None, None, :]
        sim = jnp.where(mask, sim, -2.3819763e38)  # kernel's DEFAULT_MASK_VALUE
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def flash_mha(q_bthd, k_bthd, v_bthd, sm_scale: float,
              core: str = "flash"):
    """Exact attention, flash-kernel execution.

    q/k/v: (B, T, H, dh) — the CrossAttention layout. Returns (B, Tq, H, dh).
    core: "flash" (Pallas TPU kernel) or "reference" (einsum; CPU tests).
    """
    b, tq, h, dh = q_bthd.shape
    tk = k_bthd.shape[1]
    # kernel layout (B, H, T, dh)
    q = jnp.swapaxes(q_bthd, 1, 2)
    k = jnp.swapaxes(k_bthd, 1, 2)
    v = jnp.swapaxes(v_bthd, 1, 2)

    tq_p, tk_p = _round_up(tq, 128), _round_up(tk, 128)
    need_mask = tk_p != tk
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if need_mask:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))

    seg = None
    if need_mask:
        # id 0 = real, id 1 = padding; only same-id pairs attend. Padded Q
        # rows (sliced off below) get id 1 so they attend the pad block and
        # stay finite. Real Q rows never see padded KV.
        q_ids = (jnp.arange(tq_p) >= tq).astype(jnp.int32)[None, :]
        kv_ids = (jnp.arange(tk_p) >= tk).astype(jnp.int32)[None, :]
        q_ids = jnp.broadcast_to(q_ids, (b, tq_p))
        kv_ids = jnp.broadcast_to(kv_ids, (b, tk_p))
        seg = (q_ids, kv_ids)

    if core == "reference":
        out = _reference_core(q, k, v, sm_scale, seg)
    else:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)
        bq = _pick_blocks(tq_p)
        bk = _pick_blocks(tk_p)
        blocks = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
            block_q_dq=bq)
        out = flash_attention(
            q, k, v, segment_ids=SegmentIds(*seg) if seg else None,
            causal=False, sm_scale=sm_scale, block_sizes=blocks)

    out = out[:, :, :tq]
    return jnp.swapaxes(out, 1, 2)


@functools.cache
def flash_available() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (  # noqa: F401
            flash_attention)
    except ImportError:
        return False
    # device_kind, not default_backend(): the tunneled chip registers as
    # platform "axon" (device_kind "TPU v5 lite") — a backend-name check
    # silently routed the first flash A/B back to the einsum path
    # (identical outputs, cache-hit "compile"; PERF.md round 5 phase 17)
    devs = jax.devices()
    return bool(devs) and (devs[0].platform == "tpu"
                           or "TPU" in devs[0].device_kind)
