"""int8 quantized decode engine: numerics vs the bf16 flax path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.infer.qdecode import (generate_speech_quantized, qdot,
                                    quantize_dense, quantize_gpt_decode,
                                    _decode_logits)
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.models.gpt_infer import generate_speech
from xtts_tpu.nn.transformer import KVCache

CFG = GPTConfig(layers=2, model_dim=64, heads=4, max_mel_tokens=24,
                max_text_tokens=16, number_text_tokens=32,
                start_text_token=31, number_mel_codes=34, start_mel_token=32,
                stop_mel_token=33, mel_bins=8, cond_attn_blocks=1)


@pytest.fixture(scope="module")
def setup():
    model = UnifiedVoice(CFG)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 8, 20)).astype(np.float32))
    text = jnp.asarray(rng.integers(1, 30, (1, 6)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), cond, text,
                           jnp.array([6]), jnp.zeros((1, 8), jnp.int32),
                           jnp.array([8 * 1024]))
    qt = quantize_gpt_decode(variables, CFG)
    return model, variables, qt, cond, text


class TestQuantPrimitives:
    def test_quantize_roundtrip_error(self):
        rng = np.random.default_rng(0)
        k = rng.standard_normal((64, 128)).astype(np.float32)
        q = quantize_dense(jnp.asarray(k))
        assert q["w"].dtype == jnp.int8
        deq = np.asarray(q["w"], np.float32) * np.asarray(q["scale"])[None]
        rel = np.abs(deq - k).max() / np.abs(k).max()
        assert rel < 0.01   # <= half an int8 step

    def test_qdot_matches_fp(self):
        rng = np.random.default_rng(1)
        k = rng.standard_normal((32, 16)).astype(np.float32)
        x = rng.standard_normal((2, 32)).astype(np.float32)
        q = quantize_dense(jnp.asarray(k))
        ref = x @ k
        out = np.asarray(qdot(jnp.asarray(x, jnp.bfloat16), q))
        assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 0.05


class TestQuantizedDecode:
    def test_logits_close_to_flax(self, setup):
        model, variables, qt, cond, text = setup
        prefix, _ = model.apply(variables, cond, text,
                                method=model.encode_prefix)
        b, p_len, _ = prefix.shape
        cache = KVCache.zeros(CFG.layers, b, p_len + 8, CFG.heads,
                              CFG.model_dim // CFG.heads, dtype=jnp.float32)
        _, cache = model.apply(variables, prefix, cache, method=model.prefill)

        tok = jnp.array([5], jnp.int32)
        ref_logits, _ = model.apply(variables, tok, 1, cache, p_len,
                                    method=model.decode_one)
        q_logits, _ = _decode_logits(qt, CFG.heads, tok, 1, cache, p_len)
        ref = np.asarray(ref_logits, np.float32)
        got = np.asarray(q_logits, np.float32)
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / denom < 0.1

    def test_greedy_generation_matches(self, setup):
        """At random-init scale the logit gaps usually dominate int8 noise;
        greedy paths should agree on most tokens (and full equality on
        lengths/shape contracts)."""
        model, variables, qt, cond, text = setup
        r1 = generate_speech(model, variables, cond, text,
                             jax.random.PRNGKey(0), max_gen=8,
                             do_sample=False, cache_dtype=jnp.float32)
        r2 = generate_speech_quantized(model, variables, qt, cond, text,
                                       jax.random.PRNGKey(0), max_gen=8,
                                       do_sample=False,
                                       cache_dtype=jnp.float32)
        assert r2.codes.shape == r1.codes.shape
        agree = float((r1.codes == r2.codes).mean())
        assert agree >= 0.75, (np.asarray(r1.codes), np.asarray(r2.codes))

    def test_int8_kv_cache_generation(self, setup):
        """quantize_kv_cache=True stays close to the f32-cache int8 engine."""
        model, variables, qt, cond, text = setup
        r1 = generate_speech_quantized(model, variables, qt, cond, text,
                                       jax.random.PRNGKey(0), max_gen=8,
                                       do_sample=False,
                                       cache_dtype=jnp.float32)
        r2 = generate_speech_quantized(model, variables, qt, cond, text,
                                       jax.random.PRNGKey(0), max_gen=8,
                                       do_sample=False,
                                       cache_dtype=jnp.float32,
                                       quantize_kv_cache=True)
        agree = float((r1.codes == r2.codes).mean())
        assert agree >= 0.75, (np.asarray(r1.codes), np.asarray(r2.codes))

    def test_quant_kv_roundtrip_error(self):
        from xtts_tpu.infer.qdecode import QuantKVCache, quantize_kv
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.standard_normal((2, 1, 8, 4, 16)).astype(np.float32))
        qc = quantize_kv(KVCache(k, k * 2.0))
        deq = np.asarray(qc.k, np.float32) * np.asarray(qc.k_scale)[..., None]
        rel = np.abs(deq - np.asarray(k)).max() / np.abs(np.asarray(k)).max()
        assert rel < 0.01

    def test_sampled_generation_valid(self, setup):
        model, variables, qt, cond, text = setup
        r = generate_speech_quantized(model, variables, qt, cond, text,
                                      jax.random.PRNGKey(3), max_gen=8,
                                      do_sample=True, cache_dtype=jnp.float32)
        codes = np.asarray(r.codes)
        assert ((codes >= 0) & (codes < CFG.number_mel_codes)).all()
        assert int(r.lengths[0]) <= 8


class TestFusedEngine:
    def test_fused_generate_matches_xla_engine(self, setup):
        """use_fused=True runs each token as one pallas_call (interpret on
        CPU); greedy codes must agree with the XLA step chain."""
        model, variables, qt, cond, text = setup
        r0 = generate_speech_quantized(model, variables, qt, cond, text,
                                       jax.random.PRNGKey(0), max_gen=8,
                                       do_sample=False,
                                       cache_dtype=jnp.bfloat16)
        r1 = generate_speech_quantized(model, variables, qt, cond, text,
                                       jax.random.PRNGKey(0), max_gen=8,
                                       do_sample=False,
                                       cache_dtype=jnp.bfloat16,
                                       use_fused=True)
        agree = float((np.asarray(r0.codes) == np.asarray(r1.codes)).mean())
        assert agree >= 0.75, (np.asarray(r0.codes), np.asarray(r1.codes))
        assert int(r1.lengths[0]) <= 8


class TestQuantizationQualityGate:
    """VERDICT r2 #9: the acceptance check for default-enabling a quantized
    engine — teacher-forced greedy agreement vs the fp decode chain."""

    def test_int8_gate_high_agreement(self, setup):
        from xtts_tpu.infer.qdecode import quantization_quality_gate
        model, variables, qt, cond, text = setup
        rng = np.random.default_rng(5)
        codes = rng.integers(0, 31, (1, 24)).astype(np.int32)
        res = quantization_quality_gate(model, variables, cond, text, codes,
                                        bits=8, min_agreement=0.9)
        assert res["bits"] == 8 and res["n_positions"] == 24
        # int8 logits track fp within ~1e-2 relative; random tiny-model
        # logits are flat, so demand a high-but-not-perfect bar
        assert res["agreement"] >= 0.9
        assert res["passed"]

    def test_int4_gate_reports_lower_agreement(self, setup):
        from xtts_tpu.infer.qdecode import quantization_quality_gate
        model, variables, qt, cond, text = setup
        rng = np.random.default_rng(6)
        codes = rng.integers(0, 31, (1, 24)).astype(np.int32)
        r8 = quantization_quality_gate(model, variables, cond, text, codes,
                                       bits=8)
        r4 = quantization_quality_gate(model, variables, cond, text, codes,
                                       bits=4)
        # int4 is strictly coarser than int8 on random (flat-logit) weights
        assert r4["agreement"] <= r8["agreement"] + 1e-6

    def test_kv_quant_gate_contract(self, setup):
        """kv_quant=True gates the int8-KV serving lever on the same
        teacher-forced-agreement axis as the weight quantization."""
        from xtts_tpu.infer.qdecode import quantization_quality_gate
        model, variables, qt, cond, text = setup
        rng = np.random.default_rng(7)
        codes = rng.integers(0, 31, (1, 16)).astype(np.int32)
        res = quantization_quality_gate(model, variables, cond, text, codes,
                                        bits=8, kv_quant=True)
        assert res["kv_quant"] and not res["fused_serving"]
        assert 0.0 <= res["agreement"] <= 1.0
        with pytest.raises(ValueError):
            quantization_quality_gate(model, variables, cond, text, codes,
                                      kv_quant=True, fused_serving=True)

    def test_fused_serving_gate_contract(self, setup):
        """fused_serving=True gates the whole-step Pallas serving kernel
        (coarser per-position int8 KV) — rows must be 8 or 16."""
        from xtts_tpu.infer.qdecode import quantization_quality_gate
        model, variables, qt, cond, text = setup
        rng = np.random.default_rng(8)
        b = 8
        cond8 = jnp.tile(cond, (b, 1, 1))
        text8 = jnp.tile(text, (b, 1))
        codes = rng.integers(0, 31, (b, 6)).astype(np.int32)
        res = quantization_quality_gate(model, variables, cond8, text8,
                                        codes, bits=8, fused_serving=True)
        assert res["fused_serving"] and res["n_positions"] == b * 6
        assert 0.0 <= res["agreement"] <= 1.0

    def test_int4_grid_matches_fused_packing_math(self, setup):
        """requantize_int4_tree must reproduce stack_qtree_int4's weight grid
        (ops/decode_step.py:427-432) so the XLA-chain gate measures the SAME
        weights the fused kernel streams."""
        from xtts_tpu.infer.qdecode import requantize_int4_tree
        model, variables, qt, cond, text = setup
        t4 = requantize_int4_tree(qt)
        q = qt["layers"][0]["qkv"]
        w = np.asarray(q["w"], np.float32) * np.asarray(q["scale"])[None]
        s4 = np.maximum(np.abs(w).max(axis=0) / 7.0, 1e-8)
        w4 = np.clip(np.round(w / s4[None]), -7, 7)
        np.testing.assert_array_equal(
            np.asarray(t4["layers"][0]["qkv"]["w"]), w4.astype(np.int8))
        np.testing.assert_allclose(np.asarray(t4["layers"][0]["qkv"]["scale"]),
                                   s4, rtol=1e-6)
        assert int(np.abs(np.asarray(t4["layers"][0]["qkv"]["w"])).max()) <= 7


class TestCacheLadderQuantized:
    def test_ladder_matches_monolithic(self, setup):
        model, variables, qt, cond, text = setup
        kw = dict(max_gen=12, top_p=0.8, temperature=0.8)
        base = generate_speech_quantized(model, variables, qt, cond, text,
                                         jax.random.PRNGKey(3), **kw)
        lad = generate_speech_quantized(model, variables, qt, cond, text,
                                        jax.random.PRNGKey(3),
                                        cache_ladder=(4, 8), **kw)
        np.testing.assert_array_equal(np.asarray(base.codes),
                                      np.asarray(lad.codes))
        np.testing.assert_array_equal(np.asarray(base.lengths),
                                      np.asarray(lad.lengths))

    def test_ladder_matches_with_quantized_kv(self, setup):
        model, variables, qt, cond, text = setup
        kw = dict(max_gen=10, do_sample=False, quantize_kv_cache=True)
        base = generate_speech_quantized(model, variables, qt, cond, text,
                                         jax.random.PRNGKey(1), **kw)
        lad = generate_speech_quantized(model, variables, qt, cond, text,
                                        jax.random.PRNGKey(1),
                                        cache_ladder=(5,), **kw)
        np.testing.assert_array_equal(np.asarray(base.codes),
                                      np.asarray(lad.codes))


    def test_fused_ladder_matches_fused_monolithic(self, setup):
        """The cache ladder on the fused B=1 path (per-rung kernel shapes)
        must be token-exact vs the monolithic fused cache."""
        model, variables, qt, cond, text = setup
        kw = dict(max_gen=8, do_sample=False, cache_dtype=jnp.bfloat16,
                  use_fused=True)
        base = generate_speech_quantized(model, variables, qt, cond, text,
                                         jax.random.PRNGKey(0), **kw)
        lad = generate_speech_quantized(model, variables, qt, cond, text,
                                        jax.random.PRNGKey(0),
                                        cache_ladder=(3, 6), **kw)
        np.testing.assert_array_equal(np.asarray(base.codes),
                                      np.asarray(lad.codes))
        np.testing.assert_array_equal(np.asarray(base.lengths),
                                      np.asarray(lad.lengths))
