"""HTTP serving front-end tests (xtts_tpu.infer.http) on the tiny config.

Covers the deployable layer above BatchServer: JSON request parsing, WAV
response framing, sentence splitting into the shared microbatch window,
per-request voice caching, and error paths.
"""
import importlib.util
import io
import json
import os
import threading
import urllib.error
import urllib.request
import wave

import jax
import numpy as np
import pytest

from test_api_e2e import MEL_BINS, TINY
from xtts_tpu.infer.api import TTSSettings, TextToSpeech

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from xtts_tpu.infer import http as serve_http


@pytest.fixture(scope="module")
def svc():
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0))
    cond = np.zeros(4000, np.float32)
    s = serve_http.SynthesisService(
        tts, cond, settings=TTSSettings(max_mel_tokens=8), max_batch=4,
        window_ms=5.0)
    yield s
    s.close()


@pytest.fixture(scope="module")
def url(svc):
    httpd = serve_http.serve(svc, "127.0.0.1", 0)
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/tts", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=600)


def test_healthz(url):
    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        assert r.status == 200
        assert json.loads(r.read())["ok"] is True


def test_tts_returns_wav(url, svc):
    with _post(url, {"text": "你好。世界！"}) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == svc.sample_rate
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        assert w.getnframes() > 0


def test_concurrent_requests_microbatch(url):
    """Two handler threads submit into one BatchServer window; both succeed."""
    out = {}

    def hit(k):
        with _post(url, {"text": "你好。"}) as r:
            out[k] = (r.status, len(r.read()))

    ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert all(v[0] == 200 and v[1] > 44 for v in out.values())  # >WAV header


def test_per_request_voice_path(url, svc, tmp_path_factory):
    from xtts_tpu.data.audio import save_wav
    p = str(tmp_path_factory.mktemp("voice") / "ref.wav")
    rng = np.random.default_rng(1)
    save_wav(p, (rng.standard_normal(6000) * 0.1).astype(np.float32), 24000)
    with _post(url, {"text": "你好。", "voice_path": p}) as r:
        assert r.status == 200 and len(r.read()) > 44
    assert p in svc._voice_cache          # cached after first use
    with _post(url, {"text": "你好。", "voice_path": p}) as r:
        assert r.status == 200


def test_bad_request_and_unknown_path(url):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, {"lang": "ZH"})        # missing "text"
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url + "/nope", timeout=60)
    assert ei.value.code == 404


def test_wav_bytes_roundtrip():
    wav = np.sin(np.linspace(0, 40, 2400)).astype(np.float32) * 0.5
    data = serve_http.wav_bytes(wav, 24000)
    with wave.open(io.BytesIO(data)) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, wav, atol=1e-4)


def test_slots_backend_http():
    """backend='slots': the HTTP layer over ContinuousBatcher — same JSON/
    WAV contract, health endpoint, multi-sentence concat."""
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0),
                       quantized_decode=True)
    svc = serve_http.SynthesisService(
        tts, np.zeros(4000, np.float32),
        settings=TTSSettings(max_mel_tokens=8), max_batch=2,
        backend="slots")
    try:
        # slots warmup drives real dummy requests through the pool
        assert svc.warmup(text_lens=(8,), render_sizes=(1,)) == 1
        httpd = serve_http.serve(svc, "127.0.0.1", 0)
        host, port = httpd.server_address[:2]
        url = f"http://{host}:{port}"
        with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
            assert json.loads(r.read())["ok"] is True
        with _post(url, {"text": "你好。再见。"}) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "audio/wav"
            with wave.open(io.BytesIO(r.read())) as w:
                assert w.getnframes() > 0
        httpd.shutdown()
    finally:
        svc.close()


def test_slots_backend_rejects_hifigan():
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0),
                       quantized_decode=True)
    with pytest.raises(ValueError, match="slots"):
        serve_http.SynthesisService(tts, np.zeros(4000, np.float32),
                                    use_hifigan=True, backend="slots")


def test_metrics_endpoint(url, svc):
    """GET /metrics surfaces the backend's serving stats after traffic."""
    with _post(url, {"text": "你好。"}) as r:
        assert r.status == 200
        r.read()
    with urllib.request.urlopen(url + "/metrics", timeout=60) as r:
        m = json.loads(r.read())
    assert m["completed"] >= 1 and m["failed"] == 0
    assert m["latency_mean_s"] > 0 and m["waves"] >= 1


def test_backpressure_503_and_timeout_504():
    """A full queue maps ServerBusy -> 503; a server-side request timeout
    maps TimeoutError -> 504 (VERDICT r4 #7)."""
    tts = TextToSpeech(TINY, rng=jax.random.PRNGKey(0))
    cond = np.zeros(4000, np.float32)
    s = serve_http.SynthesisService(
        tts, cond, settings=TTSSettings(max_mel_tokens=8), max_batch=1,
        window_ms=1.0, max_pending=0)
    httpd = serve_http.serve(s, "127.0.0.1", 0)
    host, port = httpd.server_address[:2]
    u = f"http://{host}:{port}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(u, {"text": "你好。"})
        assert ei.value.code == 503
    finally:
        httpd.shutdown()
        s.close()

    s = serve_http.SynthesisService(
        tts, cond, settings=TTSSettings(max_mel_tokens=8), max_batch=1,
        window_ms=1.0, request_timeout_s=0.0)
    httpd = serve_http.serve(s, "127.0.0.1", 0)
    host, port = httpd.server_address[:2]
    u = f"http://{host}:{port}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(u, {"text": "你好。"})
        assert ei.value.code == 504
    finally:
        httpd.shutdown()
        s.close()
