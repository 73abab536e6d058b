"""Continuous batching / slot serving (xtts_tpu/infer/slots.py).

Core contract: greedy decode of every request through the slot pool —
including requests installed into RECYCLED slots mid-stream — is
TOKEN-EXACT vs the B=1 monolithic quantized engine on the same padded
text. Stop-logit-biased weights (as in test_compact.py) give spread,
deterministic stop times so refill genuinely happens."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtts_tpu.core.config import GPTConfig
from xtts_tpu.models.gpt import UnifiedVoice

CFG = GPTConfig(layers=2, model_dim=64, heads=4, max_mel_tokens=40,
                max_text_tokens=30, number_text_tokens=16, start_text_token=15,
                number_mel_codes=34, start_mel_token=32, stop_mel_token=33,
                mel_bins=20, cond_attn_blocks=2)
MAX_GEN = 24


class _FakeTTS:
    """Minimal TextToSpeech stand-in for SlotDecoder (model+vars+qtree)."""

    def __init__(self, model, variables, qtree, cfg_gpt):
        from xtts_tpu.core.config import XTTSConfig, MelConfig
        self.gpt = model
        self.vars = {"gpt": variables}
        self._qtree = qtree
        self.cfg = XTTSConfig(gpt=cfg_gpt, mel=MelConfig(n_mels=20))


@pytest.fixture(scope="module")
def engine():
    from xtts_tpu.infer.qdecode import quantize_gpt_decode
    model = UnifiedVoice(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 20, 50)),
        jnp.zeros((2, 10), jnp.int32), jnp.array([8, 10]),
        jnp.zeros((2, 20), jnp.int32), jnp.array([20 * 1024, 15 * 1024]))
    p = dict(variables["params"])
    mh = dict(p["mel_head"])
    mh["bias"] = mh["bias"].at[CFG.stop_mel_token].add(2.0)
    p["mel_head"] = mh
    variables = {"params": p}
    qtree = quantize_gpt_decode(variables, CFG, include_fused=False)
    return model, variables, qtree


def _requests(n=6, seed=5):
    rng = np.random.default_rng(seed)
    conds = [jnp.asarray(rng.standard_normal((1, 20, 30)).astype(np.float32))
             for _ in range(n)]
    texts = [rng.integers(2, 15, (5,)).astype(np.int32) for _ in range(n)]
    return texts, conds


def _mono_reference(model, variables, qtree, texts, conds):
    from xtts_tpu.infer.qdecode import generate_speech_quantized
    out = []
    for t, c in zip(texts, conds):
        r = generate_speech_quantized(model, variables, qtree, c,
                                      jnp.asarray(t)[None],
                                      jax.random.PRNGKey(0),
                                      max_gen=MAX_GEN, do_sample=False)
        out.append((np.asarray(r.codes)[0], int(r.lengths[0])))
    return out


def test_slot_greedy_exact_with_refill(engine):
    """3 slots, 6 requests: every request — first wave AND refills into
    recycled slots — must match its B=1 monolithic greedy run exactly."""
    from xtts_tpu.infer.slots import SlotDecoder
    model, variables, qtree = engine
    texts, conds = _requests()
    ref = _mono_reference(model, variables, qtree, texts, conds)
    lens = [l for _, l in ref]
    assert len(set(lens)) >= 3          # spread stop times -> refill happens

    tts = _FakeTTS(model, variables, qtree, CFG)
    dec = SlotDecoder(tts, n_slots=3, max_gen=MAX_GEN, segment_len=4,
                      text_buckets=(5,))
    pending = list(range(len(texts)))
    slot_req = {}
    results = {}
    for s in range(3):
        i = pending.pop(0)
        dec.install(s, dec.pad_text(texts[i]), conds[i])
        slot_req[s] = i
    for _ in range(100):
        done, gen = dec.run_segment_greedy()
        finished = [s for s in slot_req if done[s]]
        if finished:
            codes = dec.fetch_codes()
            for s in finished:
                i = slot_req.pop(s)
                results[i] = (codes[s], int(gen[s]))
                if pending:
                    j = pending.pop(0)
                    dec.install(s, dec.pad_text(texts[j]), conds[j])
                    slot_req[s] = j
        if not slot_req and not pending:
            break
    assert len(results) == len(texts)
    for i, (codes, length) in results.items():
        ref_codes, ref_len = ref[i]
        assert length == ref_len, f"request {i}: {length} != {ref_len}"
        np.testing.assert_array_equal(codes, ref_codes,
                                      err_msg=f"request {i}")


def test_segment_length_invariance(engine):
    """Greedy codes must not depend on the segment size."""
    from xtts_tpu.infer.slots import SlotDecoder
    model, variables, qtree = engine
    texts, conds = _requests(n=2)
    tts = _FakeTTS(model, variables, qtree, CFG)
    outs = []
    for seg in (3, MAX_GEN):
        dec = SlotDecoder(tts, n_slots=2, max_gen=MAX_GEN, segment_len=seg,
                          text_buckets=(5,))
        for s in range(2):
            dec.install(s, dec.pad_text(texts[s]), conds[s])
        for _ in range(30):
            done, gen = dec.run_segment_greedy()
            if done.all():
                break
        outs.append((dec.fetch_codes(), gen.copy()))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_empty_slots_inert(engine):
    """Uninstalled slots idle as done and must not disturb live rows."""
    from xtts_tpu.infer.slots import SlotDecoder
    model, variables, qtree = engine
    texts, conds = _requests(n=1)
    tts = _FakeTTS(model, variables, qtree, CFG)
    ref = _mono_reference(model, variables, qtree, texts, conds)[0]
    dec = SlotDecoder(tts, n_slots=4, max_gen=MAX_GEN, segment_len=8,
                      text_buckets=(5,))
    dec.install(2, dec.pad_text(texts[0]), conds[0])   # middle slot only
    for _ in range(10):
        done, gen = dec.run_segment_greedy()
        if done[2]:
            break
    codes = dec.fetch_codes()
    assert int(gen[2]) == ref[1]
    np.testing.assert_array_equal(codes[2], ref[0])


def test_continuous_batcher_e2e():
    """Full host loop on the TINY pipeline: futures resolve to finite wavs
    through the shared batched render, more requests than slots."""
    from test_api_e2e import TINY
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.slots import ContinuousBatcher
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0), quantized_decode=True)
    rng = np.random.default_rng(0)
    cond_mel = jnp.asarray(
        rng.standard_normal((1, TINY.mel.n_mels, 40)).astype(np.float32))
    cb = ContinuousBatcher(tts, cond_mel,
                           TTSSettings(max_mel_tokens=12),
                           n_slots=2, segment_len=4, render_min=2)
    texts = [np.array([1, 3, 4, 5, 2], np.int32),
             np.array([1, 6, 7, 2], np.int32),
             np.array([1, 8, 2], np.int32),
             np.array([1, 9, 10, 11, 2], np.int32),
             np.array([1, 12, 2], np.int32)]
    futs = [cb.submit(t) for t in texts]
    wavs = [f.result(timeout=900) for f in futs]
    cb.close()
    assert len(wavs) == 5
    for w in wavs:
        assert w.size > 0 and np.isfinite(w).all()


def test_slot_kv_quant_greedy_exact(engine):
    """settings.kv_quant: the int8 row-quantized slot pool (values through
    a bare convert, scales folded into scores/probs) must match the B=1
    monolithic int8-KV engine token-for-token under greedy — install-time
    prefix quantization and per-step quantization mirror quantize_kv /
    _decode_step_qkv exactly."""
    from xtts_tpu.infer.api import TTSSettings
    from xtts_tpu.infer.qdecode import generate_speech_quantized
    from xtts_tpu.infer.slots import SlotDecoder
    model, variables, qtree = engine
    texts, conds = _requests(n=3)
    ref = []
    for t, c in zip(texts, conds):
        r = generate_speech_quantized(model, variables, qtree, c,
                                      jnp.asarray(t)[None],
                                      jax.random.PRNGKey(0), max_gen=MAX_GEN,
                                      do_sample=False, quantize_kv_cache=True)
        ref.append((np.asarray(r.codes)[0], int(r.lengths[0])))

    tts = _FakeTTS(model, variables, qtree, CFG)
    dec = SlotDecoder(tts, n_slots=3, max_gen=MAX_GEN, segment_len=8,
                      text_buckets=(5,),
                      settings=TTSSettings(max_mel_tokens=MAX_GEN,
                                           kv_quant=True))
    assert len(dec.state.cache) == 4 and dec.state.cache[0].dtype == jnp.int8
    for s in range(3):
        dec.install(s, dec.pad_text(texts[s]), conds[s])
    for _ in range(20):
        done, gen = dec.run_segment_greedy()
        if done.all():
            break
    codes = dec.fetch_codes()
    for i, (rc, rl) in enumerate(ref):
        assert int(gen[i]) == rl
        np.testing.assert_array_equal(codes[i], rc, err_msg=f"req {i}")


def test_sampled_per_request_determinism(engine):
    """A request's SAMPLED output is a pure function of (text, voice, key):
    decoded alone in a 2-slot pool vs in a different slot of a 3-slot pool
    crowded with other traffic, the codes must be identical — the per-row
    RNG chains make draws independent of pool size, slot index, and
    neighbors (wave batching cannot offer this)."""
    from xtts_tpu.infer.slots import SlotDecoder
    model, variables, qtree = engine
    texts, conds = _requests(n=3)
    tts = _FakeTTS(model, variables, qtree, CFG)
    k0 = jax.random.PRNGKey(42)

    def drive(dec, slot):
        for _ in range(50):
            done, gen = dec.run_segment()
            if done[slot]:
                return dec.fetch_codes()[slot], int(gen[slot])
        raise AssertionError("request never finished")

    alone = SlotDecoder(tts, n_slots=2, max_gen=MAX_GEN, segment_len=4,
                        text_buckets=(5,))
    alone.install(0, alone.pad_text(texts[0]), conds[0], key=k0)
    codes_a, gen_a = drive(alone, 0)

    crowd = SlotDecoder(tts, n_slots=3, max_gen=MAX_GEN, segment_len=4,
                        text_buckets=(5,))
    crowd.install(0, crowd.pad_text(texts[1]), conds[1])   # busy neighbors
    crowd.install(1, crowd.pad_text(texts[2]), conds[2])
    crowd.install(2, crowd.pad_text(texts[0]), conds[0], key=k0)
    codes_c, gen_c = drive(crowd, 2)

    assert gen_a == gen_c
    np.testing.assert_array_equal(codes_a, codes_c)


def test_continuous_batcher_rerank_needs_clvp():
    from test_api_e2e import TINY
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.slots import ContinuousBatcher
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0), quantized_decode=True)
    with pytest.raises(ValueError, match="with_clvp"):
        ContinuousBatcher(tts, jnp.zeros((1, TINY.mel.n_mels, 40)),
                          TTSSettings(num_candidates=2), n_slots=2)


def test_continuous_batcher_rerank_e2e():
    """K=2 candidates per request flow through the slot pool as two
    independent rows, the harvested pair is CLVP-scored, and only the
    winner renders (BASELINE #5 semantics without the wave barrier)."""
    from test_api_e2e import TINY
    from xtts_tpu.core.config import CLVPConfig
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.slots import ContinuousBatcher
    cfg = TINY.replace(clvp=CLVPConfig(
        dim_text=32, dim_speech=32, dim_latent=16, text_enc_depth=1,
        speech_enc_depth=1, text_heads=2, speech_heads=2,
        num_speech_tokens=32))
    tts = TextToSpeech(cfg, rng=jax.random.PRNGKey(7), with_clvp=True,
                       quantized_decode=True)
    rng = np.random.default_rng(0)
    cond_mel = jnp.asarray(
        rng.standard_normal((1, TINY.mel.n_mels, 40)).astype(np.float32))
    cb = ContinuousBatcher(tts, cond_mel,
                           TTSSettings(max_mel_tokens=10, num_candidates=2),
                           n_slots=2, segment_len=4, render_min=1)
    futs = [cb.submit(np.array([1, 3, 4, 5, 2], np.int32)),
            cb.submit(np.array([1, 6, 7, 2], np.int32))]
    wavs = [f.result(timeout=900) for f in futs]
    cb.close()
    assert all(w.size > 0 and np.isfinite(w).all() for w in wavs)


def test_slot_decoder_needs_qtree(engine):
    from xtts_tpu.infer.slots import SlotDecoder
    model, variables, _ = engine
    tts = _FakeTTS(model, variables, None, CFG)
    with pytest.raises(ValueError, match="quantized_decode"):
        SlotDecoder(tts, n_slots=2)


def test_pipelined_scheduler_matches_sequential():
    """pipeline=True overlaps the done-mask sync with the next segment;
    per-request outputs must be unchanged (per-row state; refills merely
    lag a segment). Fixed request keys + deterministic shortcut render ->
    wav equality between the two schedulers."""
    from test_api_e2e import TINY
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.slots import ContinuousBatcher
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0), quantized_decode=True)
    rng = np.random.default_rng(0)
    cond_mel = jnp.asarray(
        rng.standard_normal((1, TINY.mel.n_mels, 40)).astype(np.float32))
    texts = [np.array([1, 3, 4, 5, 2], np.int32),
             np.array([1, 6, 7, 2], np.int32),
             np.array([1, 8, 2], np.int32),
             np.array([1, 9, 10, 11, 2], np.int32)]
    outs = []
    for pipe in (False, True):
        cb = ContinuousBatcher(tts, cond_mel, TTSSettings(max_mel_tokens=10),
                               n_slots=2, segment_len=4, render_min=2,
                               pipeline=pipe)
        futs = [cb.submit(t, key=jax.random.PRNGKey(100 + i))
                for i, t in enumerate(texts)]
        outs.append([np.asarray(f.result(timeout=900)) for f in futs])
        cb.close()
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_keyed_diffusion_render_traffic_independent():
    """VERDICT r4 #5: a keyed request's DIFFUSION waveform is byte-identical
    whether it runs alone in a 2-slot pool or crowded in a 3-slot pool with
    different neighbors — per-row render noise chains
    (fold_in(key, _RENDER_FOLD) -> per-row draws in p_sample_loop) plus
    own-code-bucket render grouping make the render a pure function of
    (text, voice, key)."""
    from test_api_e2e import TINY
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.slots import ContinuousBatcher
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0), quantized_decode=True)
    rng = np.random.default_rng(0)
    cond_mel = jnp.asarray(
        rng.standard_normal((1, TINY.mel.n_mels, 40)).astype(np.float32))
    settings = TTSSettings(max_mel_tokens=12, diffusion_steps=4, sampler="p")
    text_x = np.array([1, 3, 4, 5, 2], np.int32)
    key_x = jax.random.PRNGKey(123)

    cb = ContinuousBatcher(tts, cond_mel, settings, n_slots=2,
                           segment_len=4, render_min=1, use_diffusion=True)
    wav_alone = cb.submit(text_x, key=key_x).result(timeout=900)
    cb.close()

    cb = ContinuousBatcher(tts, cond_mel, settings, n_slots=3,
                           segment_len=4, render_min=2, use_diffusion=True)
    futs = [cb.submit(np.array([1, 6, 7, 2], np.int32)),
            cb.submit(text_x, key=key_x),
            cb.submit(np.array([1, 8, 9, 10, 11, 2], np.int32))]
    wav_crowd = futs[1].result(timeout=900)
    for f in (futs[0], futs[2]):
        f.result(timeout=900)
    cb.close()

    np.testing.assert_array_equal(wav_alone, wav_crowd)


def test_continuous_batcher_backpressure_and_timeout():
    """max_pending=0 rejects every submit with ServerBusy; a fully-queued
    request older than request_timeout_s fails with TimeoutError when a
    slot would otherwise take it (VERDICT r4 #7)."""
    from test_api_e2e import TINY
    from xtts_tpu.infer.api import TTSSettings, TextToSpeech
    from xtts_tpu.infer.serving import ServerBusy
    from xtts_tpu.infer.slots import ContinuousBatcher
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0), quantized_decode=True)
    cond = jnp.zeros((1, TINY.mel.n_mels, 40))

    cb = ContinuousBatcher(tts, cond, TTSSettings(max_mel_tokens=8),
                           n_slots=2, segment_len=4, max_pending=0)
    try:
        with pytest.raises(ServerBusy):
            cb.submit(np.array([1, 3, 2], np.int32))
        assert cb.stats()["completed"] == 0
    finally:
        cb.close()

    cb = ContinuousBatcher(tts, cond, TTSSettings(max_mel_tokens=8),
                           n_slots=2, segment_len=4, request_timeout_s=0.0)
    try:
        fut = cb.submit(np.array([1, 3, 2], np.int32))
        with pytest.raises(TimeoutError):
            fut.result(timeout=120)
        assert cb.stats()["timed_out"] >= 1
    finally:
        cb.close()
