"""Batched serving tests on the tiny pipeline config."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_api_e2e import MEL_BINS, TINY
from xtts_tpu.infer.api import TTSSettings, TextToSpeech
from xtts_tpu.infer.serving import (BatchServer, SynthesisRequest,
                                    synthesize_batch)


@pytest.fixture(scope="module")
def tts():
    return TextToSpeech(TINY, rng=jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def cond_mel(tts):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((1, MEL_BINS, 40)).astype(np.float32))


def test_synthesize_batch_shapes(tts, cond_mel):
    reqs = [SynthesisRequest(np.array([1, 3, 4, 2], np.int32)),
            SynthesisRequest(np.array([1, 5, 6, 7, 2], np.int32)),
            SynthesisRequest(np.array([1, 8, 2], np.int32))]
    wavs = synthesize_batch(tts, reqs, cond_mel,
                            TTSSettings(max_mel_tokens=8), use_diffusion=False)
    assert len(wavs) == 3
    for w in wavs:
        assert w.ndim == 1 and w.size > 0 and np.isfinite(w).all()


def test_synthesize_batch_diffusion(tts, cond_mel):
    reqs = [SynthesisRequest(np.array([1, 3, 2], np.int32)),
            SynthesisRequest(np.array([1, 4, 2], np.int32))]
    wavs = synthesize_batch(tts, reqs, cond_mel,
                            TTSSettings(max_mel_tokens=6, diffusion_steps=2),
                            use_diffusion=True)
    assert len(wavs) == 2 and all(np.isfinite(w).all() for w in wavs)


def test_batch_matches_single(tts, cond_mel):
    """A batch of identical requests must produce identical rows."""
    tok = np.array([1, 3, 4, 2], np.int32)
    reqs = [SynthesisRequest(tok), SynthesisRequest(tok)]
    wavs = synthesize_batch(tts, reqs, cond_mel,
                            TTSSettings(max_mel_tokens=8, temperature=1e-4),
                            use_diffusion=False, key=jax.random.PRNGKey(3))
    # near-greedy sampling + same inputs -> identical outputs
    assert wavs[0].shape == wavs[1].shape
    np.testing.assert_allclose(wavs[0], wavs[1], atol=1e-5)


@pytest.fixture(scope="module")
def tts_clvp():
    from xtts_tpu.core.config import CLVPConfig
    cfg = TINY.replace(clvp=CLVPConfig(
        dim_text=32, dim_speech=32, dim_latent=16, text_enc_depth=1,
        speech_enc_depth=1, text_heads=2, speech_heads=2,
        num_speech_tokens=32))
    return TextToSpeech(cfg, rng=jax.random.PRNGKey(7), with_clvp=True)


def test_synthesize_batch_clvp_rerank(tts_clvp, cond_mel):
    """BASELINE config #5: B utterances x K candidates in one AR program,
    per-utterance winner by batched CLVP score, full-diffusion render."""
    reqs = [SynthesisRequest(np.array([1, 3, 4, 2], np.int32)),
            SynthesisRequest(np.array([1, 5, 2], np.int32))]
    wavs = synthesize_batch(
        tts_clvp, reqs, cond_mel,
        TTSSettings(max_mel_tokens=6, diffusion_steps=2, num_candidates=3),
        use_diffusion=True, key=jax.random.PRNGKey(11))
    assert len(wavs) == 2
    assert all(w.ndim == 1 and w.size > 0 and np.isfinite(w).all()
               for w in wavs)


def test_rerank_batch_matches_per_row(tts_clvp):
    """rerank_batch (B, K) must equal per-text rerank scores."""
    clvp, cvars = tts_clvp.clvp, tts_clvp.vars["clvp"]
    rng = np.random.default_rng(3)
    texts = jnp.asarray(rng.integers(1, 200, (2, 6)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 30, (2, 3, 8)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (2, 3, 8)), jnp.int32)
    mask = mask.at[..., 0].set(1)
    got = clvp.apply(cvars, texts, codes, None, mask,
                     method=clvp.rerank_batch)
    for i in range(2):
        want = clvp.apply(cvars, texts[i], codes[i], mask[i],
                          method=clvp.rerank)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_synthesize_batch_rerank_requires_clvp(tts, cond_mel):
    with pytest.raises(ValueError):
        synthesize_batch(tts, [SynthesisRequest(np.array([1, 3, 2], np.int32))],
                         cond_mel, TTSSettings(max_mel_tokens=4,
                                               num_candidates=2))


def test_synthesize_batch_multi_clip_cond(tts, cond_mel):
    """4-D stacked conditioning mels flow through generation + diffusion."""
    rng = np.random.default_rng(5)
    stacked = jnp.asarray(
        rng.standard_normal((1, 2, MEL_BINS, 40)).astype(np.float32))
    reqs = [SynthesisRequest(np.array([1, 3, 2], np.int32)),
            SynthesisRequest(np.array([1, 4, 2], np.int32))]
    wavs = synthesize_batch(tts, reqs, stacked,
                            TTSSettings(max_mel_tokens=6, diffusion_steps=2),
                            use_diffusion=True)
    assert len(wavs) == 2 and all(np.isfinite(w).all() for w in wavs)


def test_batch_server_futures(tts, cond_mel):
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=4, window_ms=50)
    try:
        futs = [srv.submit(np.array([1, 3 + i, 2], np.int32))
                for i in range(3)]
        wavs = [f.result(timeout=120) for f in futs]
        assert all(w.ndim == 1 and np.isfinite(w).all() for w in wavs)
    finally:
        srv.close()


def test_batch_server_sequential_submissions(tts, cond_mel):
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=2, window_ms=5)
    try:
        w1 = srv.submit(np.array([1, 3, 2], np.int32)).result(timeout=120)
        w2 = srv.submit(np.array([1, 4, 2], np.int32)).result(timeout=120)
        assert w1.size > 0 and w2.size > 0
    finally:
        srv.close()


def test_synthesize_batch_hifigan():
    """Batched HifiDecoder render: per-row trim follows the latent->frame
    resize math; consistency with the single-utterance path."""
    from test_api_e2e import TINY_HIFIGAN
    tts_h = TextToSpeech(TINY.replace(hifigan=TINY_HIFIGAN),
                         rng=jax.random.PRNGKey(11), with_hifigan=True)
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, MEL_BINS, 40)).astype(np.float32))
    spk = jnp.asarray(rng.standard_normal((1, 24, 64)).astype(np.float32))
    reqs = [SynthesisRequest(np.array([1, 3, 4, 2], np.int32)),
            SynthesisRequest(np.array([1, 5, 2], np.int32))]
    wavs = synthesize_batch(tts_h, reqs, cond,
                            TTSSettings(max_mel_tokens=8),
                            use_hifigan=True, spk_mel16=spk,
                            key=jax.random.PRNGKey(2))
    assert len(wavs) == 2
    ratio = 1024 / 256 * 24000 / 22050
    for w in wavs:
        assert w.ndim == 1 and np.isfinite(w).all()
        assert w.size % 16 == 0          # up = 4*4 samples per frame
        n = w.size // 16 / ratio         # invert the trim formula
        assert abs(n - round(n)) < 0.2
    with pytest.raises(ValueError):
        synthesize_batch(tts_h, reqs, cond, TTSSettings(max_mel_tokens=8),
                         use_hifigan=True)   # no spk_mel16


def test_per_request_voices(tts, cond_mel):
    """Multi-tenant batch: each row speaks with its request's voice; rows
    match near-greedy single-request runs with the same cond."""
    rng = np.random.default_rng(9)
    cond2 = jnp.asarray(
        rng.standard_normal(cond_mel.shape).astype(np.float32))
    tok = np.array([1, 3, 4, 2], np.int32)
    s = TTSSettings(max_mel_tokens=8, temperature=1e-4)
    wavs = synthesize_batch(
        tts, [SynthesisRequest(tok, cond_mel=cond_mel),
              SynthesisRequest(tok, cond_mel=cond2)],
        cond_mel, s, use_diffusion=False, key=jax.random.PRNGKey(3))
    solo2 = synthesize_batch(
        tts, [SynthesisRequest(tok), SynthesisRequest(tok)], cond2, s,
        use_diffusion=False, key=jax.random.PRNGKey(3))
    # row 1 used cond2 -> equals the all-cond2 batch's row 1
    np.testing.assert_allclose(wavs[1], solo2[1], atol=1e-5)
    # different voices -> different codes (near-greedy, same text)
    assert wavs[0].shape != wavs[1].shape or \
        not np.allclose(wavs[0], wavs[1])


def test_per_request_voice_shape_mismatch_raises(tts, cond_mel):
    tok = np.array([1, 3, 2], np.int32)
    bad = jnp.zeros((1, MEL_BINS, 17))
    with pytest.raises(ValueError):
        synthesize_batch(tts, [SynthesisRequest(tok, cond_mel=cond_mel),
                               SynthesisRequest(tok, cond_mel=bad)],
                         cond_mel, TTSSettings(max_mel_tokens=4),
                         use_diffusion=False)


def test_cond_mel_bucketed_shared_length(tts):
    rng = np.random.default_rng(11)
    a = tts.cond_mel_bucketed(rng.standard_normal(20000).astype(np.float32))
    b = tts.cond_mel_bucketed(rng.standard_normal(50000).astype(np.float32))
    # both clips are < 3 s @ 24 kHz, so both pad to the 72000-sample bucket
    assert a.shape == b.shape


def test_batch_server_per_request_voice(tts, cond_mel):
    rng = np.random.default_rng(12)
    cond2 = jnp.asarray(
        rng.standard_normal(cond_mel.shape).astype(np.float32))
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=2)
    f1 = srv.submit(np.array([1, 3, 2], np.int32))
    f2 = srv.submit(np.array([1, 4, 2], np.int32), cond_mel=cond2)
    w1, w2 = f1.result(timeout=600), f2.result(timeout=600)
    srv.close()
    assert np.isfinite(w1).all() and np.isfinite(w2).all()


def test_mesh_sharded_serving_matches(tts, cond_mel):
    """place_on_mesh + synthesize_batch shards rows over the 'data' axis;
    results equal the unsharded run token-for-token, including dummy-row
    padding when B is not a mesh multiple (B=3 pads to 4)."""
    from jax.sharding import Mesh
    reqs = [SynthesisRequest(np.array([1, 3, 4, 2], np.int32)),
            SynthesisRequest(np.array([1, 5, 2], np.int32)),
            SynthesisRequest(np.array([1, 6, 7, 2], np.int32))]
    # near-greedy: the dummy-row padding changes the program's batch size,
    # and batched categorical draws are batch-size-dependent; argmax isn't
    s = TTSSettings(max_mel_tokens=8, temperature=1e-4)
    base = synthesize_batch(tts, reqs, cond_mel, s, use_diffusion=False,
                            key=jax.random.PRNGKey(4))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    tts.place_on_mesh(mesh)
    try:
        sharded = synthesize_batch(tts, reqs, cond_mel, s,
                                   use_diffusion=False,
                                   key=jax.random.PRNGKey(4))
    finally:
        tts.mesh = None           # module-scoped fixture: restore
    assert len(sharded) == 3
    for a, b in zip(base, sharded):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_per_request_speaker_mels_hifigan():
    """Per-request spk_mel16 gives each row its own speaker d-vector in the
    hifigan render (review finding: it used to be silently shared)."""
    from test_api_e2e import TINY_HIFIGAN
    tts_h = TextToSpeech(TINY.replace(hifigan=TINY_HIFIGAN),
                         rng=jax.random.PRNGKey(11), with_hifigan=True)
    rng = np.random.default_rng(6)
    cond = jnp.asarray(rng.standard_normal((1, MEL_BINS, 40)).astype(np.float32))
    spk_a = jnp.asarray(rng.standard_normal((1, 24, 64)).astype(np.float32))
    spk_b = jnp.asarray(5 * rng.standard_normal((1, 24, 64)).astype(np.float32))
    tok = np.array([1, 3, 4, 2], np.int32)
    s = TTSSettings(max_mel_tokens=8, temperature=1e-4)
    both_a = synthesize_batch(
        tts_h, [SynthesisRequest(tok), SynthesisRequest(tok)], cond, s,
        use_hifigan=True, spk_mel16=spk_a, key=jax.random.PRNGKey(2))
    mixed = synthesize_batch(
        tts_h, [SynthesisRequest(tok), SynthesisRequest(tok, spk_mel16=spk_b)],
        cond, s, use_hifigan=True, spk_mel16=spk_a, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(mixed[0], both_a[0], atol=1e-5)  # row 0: spk_a
    assert not np.allclose(mixed[1], both_a[1])                 # row 1: spk_b


def test_batch_server_groups_mismatched_cond_shapes(tts, cond_mel):
    """A tenant with a different cond shape must not fail its co-batched
    neighbors: the server groups by shape and runs separate programs."""
    other = jnp.zeros((1, MEL_BINS, cond_mel.shape[2] + 9))
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=4, window_ms=300.0)
    f1 = srv.submit(np.array([1, 3, 2], np.int32))
    f2 = srv.submit(np.array([1, 4, 2], np.int32), cond_mel=other)
    w1, w2 = f1.result(timeout=600), f2.result(timeout=600)
    srv.close()
    assert np.isfinite(w1).all() and np.isfinite(w2).all()


def test_batch_server_close_cancels_queued(tts, cond_mel):
    """close() cancels futures that never made it into a device program
    instead of leaving them pending forever."""
    from concurrent.futures import Future
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=4),
                      max_batch=1, window_ms=1)
    f_live = srv.submit(np.array([1, 3, 2], np.int32))
    f_live.result(timeout=600)          # worker drains the first request
    srv._stop.set()                     # stop the worker loop...
    srv._thread.join(timeout=10)
    f_stale: Future = Future()          # ...then strand a queued request
    srv._q.put((np.array([1, 4, 2], np.int32), None, None, f_stale))
    srv.close()
    assert f_stale.cancelled()


def test_batch_buckets_match_unbucketed(tts, cond_mel):
    """Dummy-row padding to a batch bucket must not change real rows
    (row math is independent; near-greedy so draws don't matter)."""
    tok = np.array([1, 3, 4, 2], np.int32)
    reqs = [SynthesisRequest(tok) for _ in range(3)]
    s = TTSSettings(max_mel_tokens=8, temperature=1e-4)
    a = synthesize_batch(tts, reqs, cond_mel, s, use_diffusion=False,
                         key=jax.random.PRNGKey(3))
    b = synthesize_batch(tts, reqs, cond_mel, s, use_diffusion=False,
                         key=jax.random.PRNGKey(3), batch_buckets=(4, 8))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert x.shape == y.shape
        np.testing.assert_allclose(x, y, atol=1e-5)


def test_batch_buckets_overflow_runs_unbucketed(tts, cond_mel):
    """Counts above the largest bucket run as-is (no negative pad)."""
    reqs = [SynthesisRequest(np.array([1, 3, 2], np.int32))] * 3
    wavs = synthesize_batch(tts, reqs, cond_mel,
                            TTSSettings(max_mel_tokens=6),
                            use_diffusion=False, batch_buckets=(2,))
    assert len(wavs) == 3 and all(np.isfinite(w).all() for w in wavs)


def test_server_warmup_and_bucketed_submit(tts, cond_mel):
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=4, batch_buckets=(2, 4))
    try:
        assert srv.batch_buckets == (2, 4)
        assert srv.warmup(text_lens=(4,), batch_sizes=(2,)) == 1
        f = srv.submit(np.array([1, 3, 2], np.int32))
        w = f.result(timeout=120)
        assert w.size > 0 and np.isfinite(np.asarray(w)).all()
    finally:
        srv.close()


def test_submit_rejects_overlong_text(tts, cond_mel):
    """Over-capacity text raises at submit() (caller's thread) instead of
    poisoning a co-batched device program (encode_prefix would refuse it
    at trace time — position table is max_text_tokens+2)."""
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6))
    try:
        too_long = np.ones(tts.cfg.gpt.max_text_tokens + 1, np.int32)
        with pytest.raises(ValueError, match="max_text_tokens"):
            srv.submit(too_long)
    finally:
        srv.close()


def test_batch_server_backpressure(tts, cond_mel):
    """max_pending: once the queue holds that many unpacked requests,
    submit() raises ServerBusy in the caller's thread (fail fast, VERDICT
    r4 #7) instead of growing the queue without bound."""
    from xtts_tpu.infer.serving import ServerBusy
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=1, window_ms=1, max_pending=2)
    try:
        futs, rejected = [], 0
        for i in range(8):
            try:
                futs.append(srv.submit(np.array([1, 3, 2], np.int32)))
            except ServerBusy:
                rejected += 1
        # the worker drains at most a couple while we submit back-to-back;
        # with depth 2 the 8-burst must see rejections
        assert rejected >= 1
        assert srv.stats()["oov_dropped"] >= 0   # stats stay serveable
        for f in futs:
            assert f.result(timeout=300).size > 0
    finally:
        srv.close()


def test_batch_server_request_timeout(tts, cond_mel):
    """request_timeout_s: a request that waited in the queue past the
    deadline fails with TimeoutError at pack time rather than occupying a
    wave; the drop is counted in stats()["timed_out"]."""
    srv = BatchServer(tts, cond_mel, TTSSettings(max_mel_tokens=6),
                      max_batch=2, window_ms=1, request_timeout_s=0.0)
    try:
        fut = srv.submit(np.array([1, 3, 2], np.int32))
        with pytest.raises(TimeoutError):
            fut.result(timeout=60)
        deadline = time.time() + 10
        while srv.stats()["timed_out"] < 1 and time.time() < deadline:
            time.sleep(0.05)
        assert srv.stats()["timed_out"] >= 1
    finally:
        srv.close()
