"""Flash-decode attention kernel parity vs the XLA einsum path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.ops.decode_attention import (decode_attention,
                                           decode_attention_batched,
                                           decode_attention_dma,
                                           decode_attention_xla)


@pytest.mark.parametrize("index", [0, 63, 128, 255])
@pytest.mark.parametrize("fn", [decode_attention_dma,
                                decode_attention_batched])
def test_dma_variants_match_xla(fn, index):
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 4, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 256, 4, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 256, 4, 64)).astype(np.float32))
    ref = decode_attention_xla(q, k, v, index)
    out = fn(q, k, v, index)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _mk(b=2, s=256, h=4, hd=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, hd)).astype(np.float32), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, h, hd)).astype(np.float32), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, h, hd)).astype(np.float32), dtype)
    return q, k, v


@pytest.mark.parametrize("index", [0, 1, 127, 128, 200, 255])
def test_matches_xla_f32(index):
    q, k, v = _mk()
    ref = decode_attention_xla(q, k, v, index)
    out = decode_attention(q, k, v, index)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_xla_bf16_cache():
    q, k, v = _mk(dtype=jnp.bfloat16)
    ref = decode_attention_xla(q, k, v, 150)
    out = decode_attention(q, k, v, 150)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_invalid_positions_ignored():
    """Garbage beyond `index` must not affect the output."""
    q, k, v = _mk(s=256)
    out1 = decode_attention(q, k, v, 100)
    k2 = k.at[:, 101:].set(1e4)
    v2 = v.at[:, 101:].set(-1e4)
    out2 = decode_attention(q, k2, v2, 100)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_single_block():
    q, k, v = _mk(s=128)
    ref = decode_attention_xla(q, k, v, 64)
    out = decode_attention(q, k, v, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_traced_index():
    """index may be a traced scalar (it is, inside the decode while_loop)."""
    q, k, v = _mk(s=256)

    @jax.jit
    def f(i):
        return decode_attention(q, k, v, i)

    ref = decode_attention_xla(q, k, v, 77)
    np.testing.assert_allclose(np.asarray(f(jnp.int32(77))),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
