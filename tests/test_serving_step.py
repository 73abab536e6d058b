"""Fused batched serving decode-step kernel (ops/serving_step.py) parity.

Interpret-mode (CPU) checks against the shipped XLA engines:
logits tolerance vs the f32-cache chain (the int8 per-position KV
quantization bounds the error), exact padding/mask inertness, chunked ==
single-chunk streaming, and generation-level token agreement through
generate_speech_quantized(use_fused_serving=True) including the cache
ladder.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_decode_step import (D, HEADS, LAYERS, S_MAX, VOCAB, make_qtree)
from xtts_tpu.infer import qdecode
from xtts_tpu.nn.transformer import KVCache
from xtts_tpu.ops import decode_step, serving_step

B = 8


def make_batch_cache(seed, prefix_len):
    rng = np.random.default_rng(seed)
    k = np.zeros((LAYERS, B, S_MAX, HEADS, D // HEADS), np.float32)
    v = np.zeros_like(k)
    k[:, :, :prefix_len] = rng.standard_normal(
        (LAYERS, B, prefix_len, HEADS, D // HEADS)) * 0.5
    v[:, :, :prefix_len] = rng.standard_normal(
        (LAYERS, B, prefix_len, HEADS, D // HEADS)) * 0.5
    return KVCache(jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16))


def run_fused(qt, stacked, cache, tok, mel_pos, index):
    kc, vc, ks, vs = serving_step.quantize_kv_rowwise(cache, S_MAX)
    x = (qt["mel_embedding"][tok]
         + qt["mel_pos_embedding"][jnp.atleast_1d(mel_pos)])
    return serving_step.fused_serving_logits(
        stacked, x, kc, vc, ks, vs, index, LAYERS, HEADS, interpret=True)


@pytest.mark.parametrize("index", [3, 40, S_MAX - 1])
def test_single_step_matches_xla_engine(index):
    qt = make_qtree(0)
    stacked = decode_step.stack_qtree(qt, VOCAB)
    cache = make_batch_cache(7 + index, index)
    tok = jnp.asarray(np.arange(B) % 5 + 1, jnp.int32)
    mel_pos = 4

    ref_logits, ref_cache = qdecode._decode_logits(
        qt, HEADS, tok, mel_pos, cache, index)
    logits, kc2, vc2, ks2, vs2 = run_fused(qt, stacked, cache, tok,
                                           mel_pos, index)

    ref = np.asarray(ref_logits, np.float32)
    got = np.asarray(logits[:, :VOCAB], np.float32)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.1
    # padded head cols unreachable
    assert float(jnp.max(logits[:, VOCAB:])) < -1e8

    # the new rows landed at `index` (dequantized ~ the reference rows)
    newk = (np.asarray(kc2[:, :, index], np.float32)
            * np.asarray(ks2[:, :, index])[..., None])
    refk = np.asarray(ref_cache.k[:, :, index], np.float32
                      ).reshape(LAYERS, B, D)
    nd = np.abs(refk).max() + 1e-6
    assert np.abs(newk - refk).max() / nd < 0.05
    # ... and nothing else moved
    mask = np.arange(S_MAX) != index
    kq0, *_ = serving_step.quantize_kv_rowwise(cache, S_MAX)
    np.testing.assert_array_equal(np.asarray(kc2[:, :, mask]),
                                  np.asarray(kq0[:, :, mask]))


def test_vmem_budget_invariant():
    """Weight ring + the 4 chunk slots must stay under the ~12 MB scoped
    budget (16 MB VMEM minus ~2.5 MB aux) at every supported shape."""
    d = 1024
    for b in (8, 16):
        for s_max in (256, 512, 1024, 2048, 4096):
            sc = serving_step._pick_chunk(b, d, s_max)
            g = serving_step._pick_group(b, d, sc, decode_step.RING,
                                         decode_step.GROUP)
            total_mb = (decode_step.RING * g * d * d
                        + 4 * b * sc * d) / (1 << 20)
            assert total_mb <= 12.0, (b, s_max, sc, g, total_mb)
            assert g >= 1 and sc % 8 == 0 and s_max % sc == 0


def test_chunked_matches_single_chunk():
    """XTTS_SERVING_CHUNK=32 (4 chunks over S=128) must agree with the
    single-chunk kernel to online-softmax re-association tolerance."""
    qt = make_qtree(1)
    stacked = decode_step.stack_qtree(qt, VOCAB)
    cache = make_batch_cache(11, 50)
    tok = jnp.asarray(np.arange(B) % 7 + 1, jnp.int32)
    l1, *_ = run_fused(qt, stacked, cache, tok, 5, 50)
    os.environ["XTTS_SERVING_CHUNK"] = "32"
    try:
        serving_step._fused_serving_logits.clear_cache()
        l2, *_ = run_fused(qt, stacked, cache, tok, 5, 50)
    finally:
        del os.environ["XTTS_SERVING_CHUNK"]
        serving_step._fused_serving_logits.clear_cache()
    np.testing.assert_allclose(np.asarray(l1[:, :VOCAB]),
                               np.asarray(l2[:, :VOCAB]),
                               rtol=2e-2, atol=2e-2)


def test_padding_is_inert():
    """Garbage in cache positions >= index must not change the logits
    (the mask, not the data, defines validity — ladder growth relies on
    this)."""
    qt = make_qtree(2)
    stacked = decode_step.stack_qtree(qt, VOCAB)
    idx = 30
    cache = make_batch_cache(5, idx)
    tok = jnp.asarray(np.ones(B), jnp.int32)
    clean, *_ = run_fused(qt, stacked, cache, tok, 3, idx)
    dirty = KVCache(
        cache.k.at[:, :, idx:].set(37.0), cache.v.at[:, :, idx:].set(-21.0))
    noisy, *_ = run_fused(qt, stacked, dirty, tok, 3, idx)
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(noisy))


class TestGenerationLevel:
    """Through generate_speech_quantized(use_fused_serving=True)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from test_qdecode import CFG
        from xtts_tpu.models.gpt import UnifiedVoice
        model = UnifiedVoice(CFG)
        rng = np.random.default_rng(0)
        cond = jnp.asarray(
            rng.standard_normal((B, 8, 20)).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 30, (B, 6)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), cond[:1], text[:1],
                               jnp.array([6]), jnp.zeros((1, 8), jnp.int32),
                               jnp.array([8 * 1024]))
        qt = qdecode.quantize_gpt_decode(variables, CFG)
        qdecode.attach_fused_stack(qt, CFG)
        return model, variables, qt, cond, text

    def test_greedy_agreement_and_ladder(self, setup):
        model, variables, qt, cond, text = setup
        kw = dict(max_gen=8, do_sample=False)
        ref = qdecode.generate_speech_quantized(
            model, variables, qt, cond, text, jax.random.PRNGKey(0), **kw)
        got = qdecode.generate_speech_quantized(
            model, variables, qt, cond, text, jax.random.PRNGKey(0),
            use_fused_serving=True, **kw)
        assert got.codes.shape == ref.codes.shape
        agree = float((ref.codes == got.codes).mean())
        assert agree >= 0.75, (np.asarray(ref.codes), np.asarray(got.codes))
        lad = qdecode.generate_speech_quantized(
            model, variables, qt, cond, text, jax.random.PRNGKey(0),
            use_fused_serving=True, cache_ladder=(4,), **kw)
        agree_l = float((got.codes == lad.codes).mean())
        assert agree_l >= 0.75, (np.asarray(got.codes), np.asarray(lad.codes))
