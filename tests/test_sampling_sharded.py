"""Sampling-warp unit tests + SPMD data-parallel generation test.

The sharded test is the serving-side complement to the training dryrun
(SURVEY.md §2.12): batch-sharded AR generation over an 8-device mesh must
produce exactly the replicated result (GSPMD partitions the while_loop)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.infer.sampling import (apply_repetition_penalty, greedy_token,
                                     sample_token, top_p_filter,
                                     typical_filter)
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.models.gpt_infer import generate_speech


class TestSamplingWarps:
    def test_top_p_keeps_head(self):
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(top_p_filter(logits, 0.8))
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert out[0, 3] < -1e8          # tail masked

    def test_top_p_one_keeps_all(self):
        logits = jnp.zeros((1, 8))
        out = np.asarray(top_p_filter(logits, 1.0))
        assert np.isfinite(out).all()

    @pytest.mark.parametrize("seed,scale", [(0, 1.0), (1, 1.0), (2, 0.05),
                                            (3, 5.0), (4, 1.0)])
    def test_top_p_binary_search_matches_sorted_oracle(self, seed, scale):
        """The binary-search top-p must select the same nucleus as the
        descending-sort + cumsum formulation (the HF TopPLogitsWarper
        reference algorithm) across peaked (scale 5), flat (scale 0.05) and
        normal logit ranges at the real 8194-wide mel vocab."""
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(
            (scale * rng.standard_normal((2, 8194))).astype(np.float32))

        def oracle(logits, top_p):
            sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep_sorted = (cum - probs) < top_p
            keep_sorted = keep_sorted.at[..., 0].set(True)
            kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                          axis=-1, keepdims=True)
            return jnp.where(logits >= kth, logits, -1e9)

        for top_p in (0.1, 0.8, 0.95):
            got = np.asarray(top_p_filter(logits, top_p))
            want = np.asarray(oracle(logits, top_p))
            kept_got = got > -1e8
            kept_want = want > -1e8
            # identical nucleus (float-rounding knife edges would differ by
            # <= 1 boundary token; none occur at these scales/seeds)
            np.testing.assert_array_equal(kept_got, kept_want)
            np.testing.assert_array_equal(got[kept_got], want[kept_want])

    def test_top_p_after_prefilter_mask(self):
        """top-p must stay exact when an earlier warp (typical sampling)
        already masked part of the vocab to -1e9 — the boundary search
        bracket must not be stretched by the filter value."""
        rng = np.random.default_rng(7)
        logits = (rng.standard_normal((1, 512)) * 0.01).astype(np.float32)
        logits[0, 256:] = -1e9                     # pre-masked half
        got = np.asarray(top_p_filter(jnp.asarray(logits), 0.5))
        kept = got > -1e8
        # ~half the unmasked tokens (near-uniform probs, p=0.5)
        assert 100 < kept.sum() < 160
        assert not kept[0, 256:].any()

    def test_repetition_penalty_direction(self):
        logits = jnp.asarray([[2.0, -2.0, 1.0]])
        seen = jnp.asarray([[True, True, False]])
        out = np.asarray(apply_repetition_penalty(logits, seen, 2.0))
        assert out[0, 0] == pytest.approx(1.0)    # positive: divided
        assert out[0, 1] == pytest.approx(-4.0)   # negative: multiplied
        assert out[0, 2] == pytest.approx(1.0)    # unseen: untouched

    def test_typical_filter_masks_atypical(self):
        logits = jnp.log(jnp.asarray([[0.97, 0.01, 0.01, 0.01]]))
        out = np.asarray(typical_filter(logits, mass=0.5))
        assert np.isfinite(out).any() and (out < -1e8).any()

    def test_greedy(self):
        assert int(greedy_token(jnp.asarray([[0.1, 5.0, 1.0]]))[0]) == 1

    def test_sample_token_respects_top_p(self):
        # distribution heavily peaked; top_p tiny -> always argmax
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        for i in range(5):
            t = sample_token(jax.random.PRNGKey(i), logits, temperature=1.0,
                             top_p=0.1)
            assert int(t[0]) == 0


CFG = GPTConfig(layers=2, model_dim=64, heads=4, max_mel_tokens=16,
                max_text_tokens=16, number_text_tokens=32,
                start_text_token=31, number_mel_codes=34, start_mel_token=32,
                stop_mel_token=33, mel_bins=8, cond_attn_blocks=1)


class TestShardedGeneration:
    def test_data_sharded_generation_matches_replicated(self):
        """Batch sharded over 8 devices == single-device result, token for
        token (same replicated PRNG key)."""
        model = UnifiedVoice(CFG)
        rng = np.random.default_rng(0)
        b = 8
        cond = jnp.asarray(rng.standard_normal((b, 8, 20)).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 30, (b, 6)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), cond[:1], text[:1],
                               jnp.array([6]), jnp.zeros((1, 8), jnp.int32),
                               jnp.array([8 * 1024]))

        ref = generate_speech(model, variables, cond, text,
                              jax.random.PRNGKey(7), max_gen=8,
                              do_sample=True, cache_dtype=jnp.float32)

        devices = jax.devices()
        assert len(devices) >= 8, "conftest provisions 8 virtual devices"
        mesh = Mesh(np.asarray(devices[:8]), ("data",))
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        cond_s = jax.device_put(cond, shard)
        text_s = jax.device_put(text, shard)
        vars_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), variables)

        out = generate_speech(model, vars_s, cond_s, text_s,
                              jax.random.PRNGKey(7), max_gen=8,
                              do_sample=True, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out.codes),
                                      np.asarray(ref.codes))
        np.testing.assert_array_equal(np.asarray(out.lengths),
                                      np.asarray(ref.lengths))

    def test_sharded_generation_with_cache_ladder(self):
        """The segmented cache ladder composes with data sharding: the
        growth copies and per-segment while_loops partition like the
        monolithic program (sharded+ladder == replicated+no-ladder)."""
        model = UnifiedVoice(CFG)
        rng = np.random.default_rng(3)
        b = 8
        cond = jnp.asarray(rng.standard_normal((b, 8, 20)).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 30, (b, 6)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), cond[:1], text[:1],
                               jnp.array([6]), jnp.zeros((1, 8), jnp.int32),
                               jnp.array([8 * 1024]))
        ref = generate_speech(model, variables, cond, text,
                              jax.random.PRNGKey(5), max_gen=8,
                              do_sample=True, cache_dtype=jnp.float32)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        vars_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), variables)
        out = generate_speech(model, vars_s,
                              jax.device_put(cond, shard),
                              jax.device_put(text, shard),
                              jax.random.PRNGKey(5), max_gen=8,
                              do_sample=True, cache_dtype=jnp.float32,
                              cache_ladder=(3, 5))
        np.testing.assert_array_equal(np.asarray(out.codes),
                                      np.asarray(ref.codes))
