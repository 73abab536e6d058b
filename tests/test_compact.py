"""Compacting decode waves (xtts_tpu/infer/compact.py).

Exactness contract: with no row drop the compacting driver is BIT-IDENTICAL
to the monolithic programs (the per-step RNG split sequence is preserved
across segment boundaries); greedy decode stays token-exact THROUGH drops
(row math is independent). The drop tests bias the mel_head's stop logit so
greedy rows finish at deterministic, well-spread steps — asserted as a
precondition so the compaction path is genuinely exercised."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.models.gpt_infer import generate_speech
from xtts_tpu.infer.compact import (default_rungs,
                                    generate_speech_compacting)

CFG = GPTConfig(layers=2, model_dim=64, heads=4, max_mel_tokens=40,
                max_text_tokens=30, number_text_tokens=16, start_text_token=15,
                number_mel_codes=34, start_mel_token=32, stop_mel_token=33,
                mel_bins=20, cond_attn_blocks=2)


@pytest.fixture(scope="module")
def model_and_vars():
    model = UnifiedVoice(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 20, 50)),
        jnp.zeros((2, 10), jnp.int32), jnp.array([8, 10]),
        jnp.zeros((2, 20), jnp.int32), jnp.array([20 * 1024, 15 * 1024]))
    return model, variables


@pytest.fixture(scope="module")
def stop_biased(model_and_vars):
    """Variables with +2.0 on the stop-token logit: greedy rows then stop at
    deterministic, spread-out steps (lengths [12, 3, 24, 6, 3, 8] on the
    seed-5 batch below) so compaction actually drops rows."""
    model, variables = model_and_vars
    p = dict(variables["params"])
    mh = dict(p["mel_head"])
    mh["bias"] = mh["bias"].at[CFG.stop_mel_token].add(2.0)
    p["mel_head"] = mh
    return model, {"params": p}


def _batch(rng_seed=5, b=6):
    rng = np.random.default_rng(rng_seed)
    cond = jnp.asarray(rng.standard_normal((b, 20, 30)).astype(np.float32))
    text = jnp.asarray(rng.integers(2, 15, (b, 5)).astype(np.int32))
    return cond, text


def _assert_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
    np.testing.assert_array_equal(np.asarray(a.lengths),
                                  np.asarray(b.lengths))


class TestFlaxEngine:
    def test_sampled_nodrop_bitexact(self, model_and_vars):
        """row_buckets that never go below B -> zero drops -> the sampled
        path must match the monolithic ladder program bitwise."""
        model, variables = model_and_vars
        cond, text = _batch(b=3)
        base = generate_speech(model, variables, cond, text,
                               jax.random.PRNGKey(7), max_gen=16,
                               cache_dtype=jnp.float32, cache_ladder=(4, 9))
        comp = generate_speech_compacting(
            model, variables, None, cond, text, jax.random.PRNGKey(7),
            max_gen=16, cache_dtype=jnp.float32, cache_ladder=(4, 9),
            row_buckets=(8,))
        _assert_equal(base, comp)

    def test_greedy_drops_token_exact(self, stop_biased):
        model, variables = stop_biased
        cond, text = _batch()
        base = generate_speech(model, variables, cond, text,
                               jax.random.PRNGKey(1), max_gen=24,
                               do_sample=False, cache_dtype=jnp.float32)
        lengths = np.asarray(base.lengths)
        # precondition: spread stop times so every rung drops rows
        assert (lengths <= 4).sum() >= 2 and (lengths > 16).sum() >= 1
        comp = generate_speech_compacting(
            model, variables, None, cond, text, jax.random.PRNGKey(1),
            max_gen=24, do_sample=False, cache_dtype=jnp.float32,
            cache_ladder=(4, 8, 16), row_buckets=(1, 2, 4, 8))
        _assert_equal(base, comp)

    def test_greedy_drops_default_rungs(self, stop_biased):
        """No explicit ladder: the power-of-two default segments the wave."""
        model, variables = stop_biased
        cond, text = _batch()
        base = generate_speech(model, variables, cond, text,
                               jax.random.PRNGKey(1), max_gen=80,
                               do_sample=False, cache_dtype=jnp.float32)
        comp = generate_speech_compacting(
            model, variables, None, cond, text, jax.random.PRNGKey(1),
            max_gen=80, do_sample=False, cache_dtype=jnp.float32,
            row_buckets=(1, 2, 4, 8))
        _assert_equal(base, comp)

    def test_default_rungs_shape(self):
        assert default_rungs(600) == (64, 128, 256, 512)
        assert default_rungs(64) == ()


class TestQuantizedEngine:
    @pytest.fixture(scope="class")
    def qtree(self, stop_biased):
        from xtts_tpu.infer.qdecode import quantize_gpt_decode
        _, variables = stop_biased
        return quantize_gpt_decode(variables, CFG, include_fused=False)

    def test_greedy_drops_token_exact(self, stop_biased, qtree):
        from xtts_tpu.infer.qdecode import generate_speech_quantized
        model, variables = stop_biased
        cond, text = _batch()
        base = generate_speech_quantized(
            model, variables, qtree, cond, text, jax.random.PRNGKey(1),
            max_gen=24, do_sample=False)
        lengths = np.asarray(base.lengths)
        assert len(set(lengths.tolist())) >= 3    # spread -> drops happen
        comp = generate_speech_compacting(
            model, variables, qtree, cond, text, jax.random.PRNGKey(1),
            max_gen=24, do_sample=False, cache_ladder=(4, 8, 16),
            row_buckets=(1, 2, 4, 8))
        _assert_equal(base, comp)

    def test_kv_quant_greedy_exact(self, stop_biased, qtree):
        from xtts_tpu.infer.qdecode import generate_speech_quantized
        model, variables = stop_biased
        cond, text = _batch()
        base = generate_speech_quantized(
            model, variables, qtree, cond, text, jax.random.PRNGKey(1),
            max_gen=24, do_sample=False, quantize_kv_cache=True)
        comp = generate_speech_compacting(
            model, variables, qtree, cond, text, jax.random.PRNGKey(1),
            max_gen=24, do_sample=False, quantize_kv_cache=True,
            cache_ladder=(4, 8, 16), row_buckets=(1, 2, 4, 8))
        _assert_equal(base, comp)

    def test_sampled_nodrop_bitexact(self, stop_biased, qtree):
        from xtts_tpu.infer.qdecode import generate_speech_quantized
        model, variables = stop_biased
        cond, text = _batch(b=3)
        base = generate_speech_quantized(
            model, variables, qtree, cond, text, jax.random.PRNGKey(3),
            max_gen=16, cache_ladder=(4, 9))
        comp = generate_speech_compacting(
            model, variables, qtree, cond, text, jax.random.PRNGKey(3),
            max_gen=16, cache_ladder=(4, 9), row_buckets=(8,))
        _assert_equal(base, comp)

    def test_kv_quant_needs_qtree(self, stop_biased):
        model, variables = stop_biased
        cond, text = _batch(b=2)
        with pytest.raises(ValueError, match="quantized engine"):
            generate_speech_compacting(
                model, variables, None, cond, text, jax.random.PRNGKey(0),
                quantize_kv_cache=True)


def test_serving_compact_settings():
    """synthesize_batch with TTSSettings.compact_rows: full pipeline wiring
    (AR compacting waves -> shortcut render), right count/order, finite."""
    from test_api_e2e import TINY
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.serving import SynthesisRequest, synthesize_batch
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    cond_mel = jnp.asarray(
        rng.standard_normal((1, TINY.mel.n_mels, 40)).astype(np.float32))
    reqs = [SynthesisRequest(np.array([1, 3, 4, 5, 2], np.int32)),
            SynthesisRequest(np.array([1, 6, 7, 2], np.int32)),
            SynthesisRequest(np.array([1, 8, 2], np.int32))]
    settings = TTSSettings(max_mel_tokens=12, cache_ladder=(4, 8),
                           compact_rows=(1, 2, 4))
    wavs = synthesize_batch(tts, reqs, cond_mel, settings)
    assert len(wavs) == 3
    for w in wavs:
        assert w.size > 0 and np.isfinite(w).all()


class TestPerRowKeys:
    def test_sampled_invariant_to_drops(self, stop_biased):
        """per_row_keys=True: a surviving row's SAMPLED codes are identical
        whether compaction dropped its neighbors (row_buckets shrink) or the
        wave stayed monolithic (no buckets below B) — the draw is a pure
        per-row function, drops can't perturb it (VERDICT r3 weak #4)."""
        model, variables = stop_biased
        cond, text = _batch()
        mono = generate_speech_compacting(
            model, variables, None, cond, text, jax.random.PRNGKey(11),
            max_gen=24, cache_dtype=jnp.float32, cache_ladder=(4, 8, 16),
            row_buckets=(16,), per_row_keys=True)
        comp = generate_speech_compacting(
            model, variables, None, cond, text, jax.random.PRNGKey(11),
            max_gen=24, cache_dtype=jnp.float32, cache_ladder=(4, 8, 16),
            row_buckets=(1, 2, 4, 8), per_row_keys=True)
        _assert_equal(mono, comp)

    def test_shared_key_default_unchanged(self, model_and_vars):
        """Default (shared key) still matches the monolithic ladder program
        bitwise when nothing drops."""
        model, variables = model_and_vars
        cond, text = _batch(b=3)
        base = generate_speech(model, variables, cond, text,
                               jax.random.PRNGKey(7), max_gen=16,
                               cache_dtype=jnp.float32, cache_ladder=(4, 9))
        comp = generate_speech_compacting(
            model, variables, None, cond, text, jax.random.PRNGKey(7),
            max_gen=16, cache_dtype=jnp.float32, cache_ladder=(4, 9),
            row_buckets=(8,))
        _assert_equal(base, comp)
