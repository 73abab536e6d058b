"""UnifiedVoice GPT tests: training forward, loss masking, and KV-cache
decode parity against a full-recompute autoregressive loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.models.gpt import UnifiedVoice, masked_ce
from xtts_tpu.models.gpt_infer import generate_speech
from xtts_tpu.nn.transformer import KVCache

CFG = GPTConfig(layers=2, model_dim=64, heads=4, max_mel_tokens=40,
                max_text_tokens=30, number_text_tokens=16, start_text_token=15,
                number_mel_codes=34, start_mel_token=32, stop_mel_token=33,
                mel_bins=20, cond_attn_blocks=2)


@pytest.fixture(scope="module")
def model_and_vars():
    model = UnifiedVoice(CFG)
    cond = jnp.zeros((2, 20, 50))
    text = jnp.zeros((2, 10), jnp.int32)
    tl = jnp.array([8, 10])
    mel = jnp.zeros((2, 20), jnp.int32)
    wl = jnp.array([20 * 1024, 15 * 1024])
    variables = model.init(jax.random.PRNGKey(0), cond, text, tl, mel, wl)
    return model, variables


def _rand_inputs(rng, b=2, tt=10, tm=20, tc=50):
    cond = jnp.asarray(rng.standard_normal((b, 20, tc)).astype(np.float32))
    text = jnp.asarray(rng.integers(2, 15, (b, tt)).astype(np.int32))
    tl = jnp.asarray(rng.integers(4, tt + 1, (b,)).astype(np.int32))
    mel = jnp.asarray(rng.integers(0, 32, (b, tm)).astype(np.int32))
    wl = jnp.asarray((rng.integers(8, tm, (b,)) * 1024).astype(np.int32))
    return cond, text, tl, mel, wl


class TestTrainingForward:
    def test_losses_finite(self, model_and_vars, rng):
        model, variables = model_and_vars
        loss_text, loss_mel = model.apply(variables, *_rand_inputs(rng))
        assert np.isfinite(float(loss_text)) and np.isfinite(float(loss_mel))

    def test_padding_content_invariance(self, model_and_vars, rng):
        """Tokens past text/mel lengths are replaced by stop tokens before
        embedding, so altering them must not change the losses."""
        model, variables = model_and_vars
        cond, text, tl, mel, wl = _rand_inputs(rng)
        tl = jnp.array([5, 6])
        l1 = model.apply(variables, cond, text, tl, mel, wl)
        text2 = text.at[:, 7:].set(3)
        l2 = model.apply(variables, cond, text2, tl, mel, wl)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)

    def test_return_latent_shape(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond, text, tl, mel, wl = _rand_inputs(rng)
        lat = model.apply(variables, cond, text, tl, mel, wl, return_latent=True)
        # mel span = Tm + 2 (stop pad + aligned) then strip 2
        assert lat.shape == (2, 20, 64)

    def test_grads_flow(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond, text, tl, mel, wl = _rand_inputs(rng)

        def loss_fn(params):
            lt, lm = model.apply({"params": params}, cond, text, tl, mel, wl)
            return 0.01 * lt + lm

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0


class TestMaskedCE:
    def test_matches_torch_ignore_index(self, rng):
        logits = rng.standard_normal((3, 7, 11)).astype(np.float32)
        targets = rng.integers(0, 11, (3, 7))
        mask = rng.integers(0, 2, (3, 7)).astype(bool)
        mask[:, 0] = True
        ours = float(masked_ce(jnp.asarray(logits), jnp.asarray(targets),
                               jnp.asarray(mask)))
        t_tar = torch.from_numpy(np.where(mask, targets, -1))
        theirs = float(F.cross_entropy(
            torch.from_numpy(logits).permute(0, 2, 1), t_tar, ignore_index=-1))
        assert ours == pytest.approx(theirs, rel=1e-5)


class TestDecodeParity:
    def test_kv_cache_matches_full_forward(self, model_and_vars, rng):
        """Greedy decode with the KV cache must match recomputing the full
        sequence every step."""
        model, variables = model_and_vars
        cond = jnp.asarray(rng.standard_normal((1, 20, 50)).astype(np.float32))
        text = jnp.asarray(rng.integers(2, 15, (1, 8)).astype(np.int32))

        res = generate_speech(model, variables, cond, text,
                              jax.random.PRNGKey(1), max_gen=6,
                              do_sample=False, cache_dtype=jnp.float32)
        fast_codes = np.asarray(res.codes)[0]

        # slow path: full forward each step
        prefix, _ = model.apply(variables, cond, text,
                                method=model.encode_prefix)

        def full_logits(m, emb):
            _, normed = m.gpt(emb)
            return m.mel_head(m.final_norm(normed[:, -1:]).astype(emb.dtype))[:, 0]

        emb = prefix
        slow = []
        for step in range(6):
            logits = model.apply(variables, emb, method=full_logits)
            tok = int(jnp.argmax(logits, -1)[0])
            slow.append(tok)

            def embed_tok(m, t, pos):
                return (m.mel_embedding(jnp.array([[t]]))
                        + m.mel_pos_embedding(jnp.array([pos])))

            # decode embeds code t at mel position t+1 when the reference
            # inference quirk is on (ttts/gpt/model.py:147-149)
            pos = step + 1 + (1 if model.cfg.decode_position_quirk else 0)
            e = model.apply(variables, tok, pos, method=embed_tok)
            emb = jnp.concatenate([emb, e], axis=1)
        np.testing.assert_array_equal(fast_codes, np.array(slow))

    def test_stop_token_ends_generation(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond = jnp.asarray(rng.standard_normal((1, 20, 30)).astype(np.float32))
        text = jnp.asarray(rng.integers(2, 15, (1, 5)).astype(np.int32))
        res = generate_speech(model, variables, cond, text,
                              jax.random.PRNGKey(0), max_gen=10)
        codes = np.asarray(res.codes)[0]
        length = int(res.lengths[0])
        # after the recorded length everything is stop padding
        assert (codes[length:] == CFG.stop_mel_token).all()

    def test_sampling_reproducible(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond = jnp.asarray(rng.standard_normal((1, 20, 30)).astype(np.float32))
        text = jnp.asarray(rng.integers(2, 15, (1, 5)).astype(np.int32))
        r1 = generate_speech(model, variables, cond, text,
                             jax.random.PRNGKey(7), max_gen=8)
        r2 = generate_speech(model, variables, cond, text,
                             jax.random.PRNGKey(7), max_gen=8)
        np.testing.assert_array_equal(np.asarray(r1.codes), np.asarray(r2.codes))


class TestPerceiverConditioning:
    """use_perceiver=True swaps the conv+attention conditioning encoder for a
    32-latent PerceiverResampler (ttts/gpt/model.py:334-338)."""

    def test_forward_and_generate(self):
        import numpy as np
        from xtts_tpu.core.config import GPTConfig
        from xtts_tpu.models.gpt import UnifiedVoice
        from xtts_tpu.models.gpt_infer import generate_speech
        cfg = GPTConfig(layers=1, model_dim=32, heads=2, max_mel_tokens=16,
                        max_text_tokens=16, number_text_tokens=32,
                        start_text_token=31, number_mel_codes=34,
                        start_mel_token=32, stop_mel_token=33, mel_bins=8,
                        use_perceiver=True, perceiver_latents=4)
        model = UnifiedVoice(cfg)
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, 8, 20)).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 30, (1, 6)).astype(np.int32))
        codes = jnp.asarray(rng.integers(0, 32, (1, 8)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), cond, text,
                               jnp.array([6]), codes, jnp.array([8 * 1024]))
        lt, lm = model.apply(variables, cond, text, jnp.array([6]), codes,
                             jnp.array([8 * 1024]))
        assert np.isfinite(float(lt)) and np.isfinite(float(lm))
        # conditioning occupies perceiver_latents prefix positions
        conds = model.apply(variables, cond, method=model.get_conditioning)
        assert conds.shape == (1, 4, 32)
        r = generate_speech(model, variables, cond, text,
                            jax.random.PRNGKey(1), max_gen=6,
                            cache_dtype=jnp.float32)
        assert r.codes.shape == (1, 6)

    def test_typical_sampling_path(self):
        import numpy as np
        from xtts_tpu.core.config import GPTConfig
        from xtts_tpu.models.gpt import UnifiedVoice
        from xtts_tpu.models.gpt_infer import generate_speech
        cfg = GPTConfig(layers=1, model_dim=32, heads=2, max_mel_tokens=16,
                        max_text_tokens=16, number_text_tokens=32,
                        start_text_token=31, number_mel_codes=34,
                        start_mel_token=32, stop_mel_token=33, mel_bins=8,
                        cond_attn_blocks=1)
        model = UnifiedVoice(cfg)
        rng = np.random.default_rng(1)
        cond = jnp.asarray(rng.standard_normal((1, 8, 20)).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 30, (1, 6)).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), cond, text,
                               jnp.array([6]), jnp.zeros((1, 8), jnp.int32),
                               jnp.array([8 * 1024]))
        r = generate_speech(model, variables, cond, text,
                            jax.random.PRNGKey(2), max_gen=6,
                            typical_mass=0.9, cache_dtype=jnp.float32)
        codes = np.asarray(r.codes)
        assert ((codes >= 0) & (codes < 34)).all()


class TestCacheLadder:
    """Segmented cache-capacity ladder (TPU-shaped KV-cache paging): growing
    the cache through static rungs must be TOKEN-EXACT vs the monolithic
    cache — excluded positions mask to exp(-1e9) == 0 exactly, so attention
    sums are unchanged."""

    def test_sampled_ladder_matches_monolithic(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond = jnp.asarray(rng.standard_normal((1, 20, 30)).astype(np.float32))
        text = jnp.asarray(rng.integers(2, 15, (1, 5)).astype(np.int32))
        base = generate_speech(model, variables, cond, text,
                               jax.random.PRNGKey(7), max_gen=16,
                               cache_dtype=jnp.float32)
        lad = generate_speech(model, variables, cond, text,
                              jax.random.PRNGKey(7), max_gen=16,
                              cache_dtype=jnp.float32,
                              cache_ladder=(4, 9))
        np.testing.assert_array_equal(np.asarray(base.codes),
                                      np.asarray(lad.codes))
        np.testing.assert_array_equal(np.asarray(base.lengths),
                                      np.asarray(lad.lengths))

    def test_batched_greedy_ladder_matches(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond = jnp.asarray(rng.standard_normal((3, 20, 30)).astype(np.float32))
        text = jnp.asarray(rng.integers(2, 15, (3, 5)).astype(np.int32))
        base = generate_speech(model, variables, cond, text,
                               jax.random.PRNGKey(0), max_gen=12,
                               do_sample=False, cache_dtype=jnp.float32)
        lad = generate_speech(model, variables, cond, text,
                              jax.random.PRNGKey(0), max_gen=12,
                              do_sample=False, cache_dtype=jnp.float32,
                              cache_ladder=(3, 6, 100))  # >max_gen rung drops
        np.testing.assert_array_equal(np.asarray(base.codes),
                                      np.asarray(lad.codes))

    def test_ladder_caps_normalization(self):
        from xtts_tpu.models.gpt_infer import ladder_caps
        assert ladder_caps(None, 10) == (10,)
        assert ladder_caps((4, 4, 20, 0, 7), 10) == (4, 7, 10)


class TestCapacityGuards:
    """OOB position-table gathers are silent NaN fills under jit (no
    torch-style IndexError); the forward must refuse over-capacity shapes
    at trace time instead (position tables sized max_*_tokens+2,
    ttts/gpt/model.py:345-348)."""

    def test_text_over_capacity_raises(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond, text, tl, mel, wl = _rand_inputs(rng, tt=CFG.max_text_tokens + 1)
        with pytest.raises(ValueError, match="max_text_tokens"):
            model.apply(variables, cond, text, tl, mel, wl)

    def test_codes_over_capacity_raises(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond, text, tl, mel, wl = _rand_inputs(rng, tm=CFG.max_mel_tokens + 1)
        with pytest.raises(ValueError, match="max_mel_tokens"):
            model.apply(variables, cond, text, tl, mel, wl)

    def test_at_capacity_ok(self, model_and_vars, rng):
        model, variables = model_and_vars
        cond, text, tl, mel, wl = _rand_inputs(rng, tt=CFG.max_text_tokens,
                                               tm=CFG.max_mel_tokens)
        lt, lm = model.apply(variables, cond, text, tl, mel, wl)
        assert np.isfinite(float(lt)) and np.isfinite(float(lm))


class TestScanStack:
    """scan-over-layers execution (GPT2Stack.scan) == unrolled stack.

    The scanned form exists because the UNROLLED teacher-forced forward at
    bs>=2 hangs the tunneled chip's remote XLA compile (PERF.md round-5
    phase-13 diagnosis); it must be math-identical on converted params."""

    def test_latent_matches_unrolled(self, model_and_vars, rng):
        from xtts_tpu.nn.transformer import scan_gpt_variables
        model, variables = model_and_vars
        inputs = _rand_inputs(rng)
        ref = model.apply(variables, *inputs, return_latent=True)
        scan_model = model.clone(scan_stack=True)
        scan_vars = scan_gpt_variables(variables, CFG.layers)
        got = scan_model.apply(scan_vars, *inputs, return_latent=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_losses_match_unrolled(self, model_and_vars, rng):
        from xtts_tpu.nn.transformer import scan_gpt_variables
        model, variables = model_and_vars
        inputs = _rand_inputs(rng)
        lt_ref, lm_ref = model.apply(variables, *inputs)
        scan_model = model.clone(scan_stack=True)
        scan_vars = scan_gpt_variables(variables, CFG.layers)
        lt, lm = scan_model.apply(scan_vars, *inputs)
        np.testing.assert_allclose(float(lt), float(lt_ref), rtol=1e-6)
        np.testing.assert_allclose(float(lm), float(lm_ref), rtol=1e-6)

    def test_collect_kv_rejected(self, model_and_vars, rng):
        """prefill/decode stay on the unrolled stack; scan mode refuses."""
        from xtts_tpu.nn.transformer import GPT2Stack
        stack = GPT2Stack(2, 64, 4, scan=True)
        x = jnp.zeros((1, 4, 64))
        v = stack.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="scan=True"):
            stack.apply(v, x, collect_kv=True)
