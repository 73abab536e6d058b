"""Fused VQ codebook nearest-neighbour lookup.

Reference semantics (ttts/vqvae/xtts_dvae.py:87-93): with codebook ``embed``
of shape (dim, n_embed),

    dist = |x|^2 - 2 x @ embed + |embed|^2        # (N, n_embed)
    codes = argmax(-dist, axis=1)                  # first index on ties

The |x|^2 term is constant per row, so the argmin only needs
``|e_j|^2 - 2 x.e_j``. The Pallas kernel tiles rows x codebook columns on the
MXU, keeping a running (min, argmin) in VMEM scratch with f32 accumulation —
strict ``<`` preserves the reference's first-index tie-break. Falls back to a
plain XLA formulation off-TPU (bit-identical argmin order).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MXU-friendly tiles: rows per program x codebook columns per program.
TILE_N = 256
TILE_E = 512


def _vq_kernel(x_ref, embed_ref, esq_ref, codes_ref, best_val, best_idx):
    """One (row-tile, code-tile) step of the running argmin.

    x_ref:     (TILE_N, D)      input rows (f32)
    embed_ref: (D, TILE_E)      codebook slab
    esq_ref:   (1, TILE_E)      precomputed |e|^2 for this slab
    codes_ref: (TILE_N, 1)      output codes (int32), written on last slab
    best_val/best_idx: VMEM scratch carried across the code-tile axis
    """
    j = pl.program_id(1)

    scores = jnp.dot(x_ref[:], embed_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    dist = esq_ref[:] - 2.0 * scores  # (TILE_N, TILE_E)

    tile_min = jnp.min(dist, axis=1, keepdims=True)                # (TILE_N, 1)
    tile_arg = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]  # first idx
    tile_arg = tile_arg + j * TILE_E

    @pl.when(j == 0)
    def _():
        best_val[:] = tile_min
        best_idx[:] = tile_arg

    @pl.when(j > 0)
    def _():
        better = tile_min < best_val[:]
        best_val[:] = jnp.where(better, tile_min, best_val[:])
        best_idx[:] = jnp.where(better, tile_arg, best_idx[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        codes_ref[:] = best_idx[:]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def vq_nearest_pallas(x: jnp.ndarray, embed: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(N, D) rows, (D, E) codebook -> (N,) int32 nearest-code indices."""
    n, d = x.shape
    d2, e = embed.shape
    assert d == d2
    n_pad = _round_up(max(n, 8), TILE_N)
    e_pad = _round_up(e, TILE_E)
    xp = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(x.astype(jnp.float32))
    ep = jnp.zeros((d, e_pad), jnp.float32).at[:, :e].set(embed.astype(jnp.float32))
    # padded codebook columns are all-zero -> |e|^2 = 0 could win the argmin;
    # push them to +inf so they never match
    esq = jnp.sum(ep * ep, axis=0, keepdims=True)
    if e_pad > e:
        esq = esq.at[:, e:].set(jnp.inf)

    grid = (n_pad // TILE_N, e_pad // TILE_E)
    codes = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TILE_E), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_E), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TILE_N, 1), jnp.float32),
            pltpu.VMEM((TILE_N, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * e_pad,
            bytes_accessed=4 * (n_pad * d + d * e_pad + n_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, ep, esq)
    return codes[:n, 0]


def vq_nearest_xla(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback with identical semantics (f32 accumulation, first-index ties)."""
    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)
    dist = (
        -2.0 * jax.lax.dot(x, embed, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(embed * embed, axis=0)[None, :]
    )
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def vq_nearest(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, XLA elsewhere.

    x may be (..., D); returns int32 codes of shape x.shape[:-1].
    """
    lead = x.shape[:-1]
    # int32 codes carry no tangent, but under value_and_grad the Pallas call
    # would still be traced with nonzero input tangents and hit Pallas's
    # unimplemented JVP rule (AssertionError on TPU trainers). stop_gradient
    # makes the tangents symbolic zeros so JVP short-circuits to the primal.
    x = jax.lax.stop_gradient(x)
    embed = jax.lax.stop_gradient(embed)
    flat = x.reshape(-1, x.shape[-1])
    if jax.default_backend() == "tpu":
        codes = vq_nearest_pallas(flat, embed)
    else:
        codes = vq_nearest_xla(flat, embed)
    return codes.reshape(lead)


def vq_soft_codes(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Full -dist "soft codes" incl. the |x|^2 term
    (ttts/vqvae/xtts_dvae.py:88-89 return_soft_codes path)."""
    x32 = x.astype(jnp.float32)
    e32 = embed.astype(jnp.float32)
    dist = (
        jnp.sum(x32 * x32, axis=-1, keepdims=True)
        - 2.0 * x32 @ e32
        + jnp.sum(e32 * e32, axis=0)[None, :]
    )
    return -dist
