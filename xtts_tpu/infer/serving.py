"""Batched synthesis serving (BASELINE config #5).

The reference has no server; its closest analogue is tortoise's fixed
num_autoregressive_samples batching (ttts/api.py:276-281). Here:

* `synthesize_batch` — B utterances through ONE AR program (per-sequence
  done-masking in the while_loop), one latent-extract, one diffusion, one
  vocode; all shapes bucketed. Per-chip throughput scales near-linearly with
  batch until HBM/compute saturates. With settings.num_candidates K > 1,
  the AR program runs B*K rows and a batched CLVP pass picks each
  utterance's winner before the render stages (ttts/api.py:397-460).
* `BatchServer` — a microbatching front: submit() returns a Future; a worker
  thread packs requests arriving within `window_ms` (up to `max_batch`) into
  one device program. This is the TPU-idiomatic replacement for per-request
  GPU streams.

KV-cache paging, TPU-shaped: the decode cache is (L, B, S, H, hd)
preallocated per batch bucket (static shapes are what XLA wants), and
`TTSSettings.cache_ladder` additionally grows S through a static capacity
ladder inside the decode program, so early steps read a much smaller
cache — the equivalent of page-table paging without dynamic shapes
(token-exact; see gpt_infer.generate_speech).
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.infer.api import TTSSettings, TextToSpeech, bucket_len


@dataclass
class SynthesisRequest:
    text_tokens: np.ndarray          # (T,) int32, framed [start..stop]
    key: Optional[jax.Array] = None
    # per-request voice: (1, mel, T) conditioning mel. All requests in a
    # batch must share T — build with TextToSpeech.cond_mel_bucketed so
    # reference clips land on a common length bucket (the reference pads/
    # crops cond clips to one fixed length too, ttts/api.py:68-79).
    # None -> the batch-level cond_mel.
    cond_mel: Optional[jnp.ndarray] = None
    # per-request speaker d-vector mel for the hifigan renderer
    # ((1, T16, 64) from speaker_mel_from_wav; all requests in a batch must
    # share the shape). None -> the batch-level spk_mel16.
    spk_mel16: Optional[jnp.ndarray] = None


def _pad_texts(texts: Sequence[np.ndarray], stop_token: int,
               buckets) -> np.ndarray:
    max_len = max(len(t) for t in texts)
    tb = bucket_len(max_len, buckets)
    out = np.full((len(texts), tb), stop_token, np.int32)
    for i, t in enumerate(texts):
        out[i, :min(len(t), tb)] = t[:tb]
    return out


def synthesize_batch(tts: TextToSpeech, requests: Sequence[SynthesisRequest],
                     cond_mel: jnp.ndarray,
                     settings: TTSSettings = TTSSettings(),
                     use_diffusion: bool = False,
                     key: Optional[jax.Array] = None,
                     use_hifigan: bool = False,
                     spk_mel16: Optional[jnp.ndarray] = None,
                     batch_buckets: Optional[Sequence[int]] = None
                     ) -> List[np.ndarray]:
    """Synthesize B utterances sharing one reference voice in one pass.

    Returns per-request waveforms trimmed to their true lengths.

    use_hifigan: render the B rows' GPT latents directly to waveform via
    the HifiDecoder (one batched program; needs with_hifigan=True and
    spk_mel16 from tts.speaker_mel_from_wav). Overrides use_diffusion.

    batch_buckets: pad the ROW COUNT up to a bucket (e.g. (1, 2, 4, 8))
    with dummy rows reusing request 0 (outputs dropped). B is a static
    shape, so without bucketing every distinct arrival count compiles a
    new multi-minute program over a tunneled chip; with it the program
    count is bounded and BatchServer.warmup can precompile the whole grid.
    Row math is independent, so real rows are unaffected up to reduction
    order; sampled draws can differ from the unbucketed program (the
    random tensor's shape includes B). Counts above the largest bucket
    run unbucketed.

    Multi-chip: after tts.place_on_mesh(mesh), the request rows are padded
    to a multiple of the mesh's 'data' size, sharded over it, and GSPMD
    partitions every program (AR while_loop included) — throughput scales
    with chips at identical tokens (tests/test_serving.py sharded test).
    """
    cfg = tts.cfg
    key = key if key is not None else jax.random.PRNGKey(0)
    n_real = len(requests)
    if n_real == 0:
        return []
    if batch_buckets:
        bb = bucket_len(n_real, tuple(batch_buckets))
        if bb > n_real:
            requests = list(requests) + [requests[0]] * (bb - n_real)
    mesh = getattr(tts, "mesh", None)
    if mesh is not None:
        n_data = mesh.shape["data"]     # place_on_mesh guarantees the axis
        pad = (-n_real) % n_data
        # dummy rows reuse request 0 (outputs dropped below)
        requests = list(requests) + [requests[0]] * pad
    text_buckets = (16, 32, 64, 128, 256, cfg.gpt.max_text_tokens)
    texts = _pad_texts([r.text_tokens for r in requests],
                       cfg.gpt.stop_text_token, text_buckets)
    b = texts.shape[0]
    if any(r.cond_mel is not None for r in requests):
        # multi-tenant batch: each row speaks with its request's voice
        per = [r.cond_mel if r.cond_mel is not None else cond_mel
               for r in requests]
        shapes = {tuple(c.shape) for c in per}
        if len(shapes) != 1 or per[0].ndim != 3:
            raise ValueError(
                "per-request cond_mels must all be (1, mel, T) with one "
                f"shared T (use cond_mel_bucketed); got {sorted(shapes)}")
        cond = jnp.concatenate(per, axis=0)
    else:
        reps = (b,) + (1,) * (cond_mel.ndim - 1)
        cond = jnp.tile(cond_mel, reps) if cond_mel.shape[0] == 1 else cond_mel

    texts = jnp.asarray(texts)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P("data"))
        texts = jax.device_put(texts, shard)
        cond = jax.device_put(cond, shard)

    k_cand = settings.num_candidates
    if k_cand > 1:
        # BASELINE config #5 "CLVP rerank": K AR samples per utterance drawn
        # in ONE (B*K)-batched program, scored pairwise by the contrastive
        # model, winners kept (ttts/api.py:397-412 semantics, batched).
        if tts.clvp is None or "clvp" not in tts.vars:
            raise ValueError(
                "settings.num_candidates > 1 needs TextToSpeech(with_clvp=True)")
        texts_k = jnp.repeat(jnp.asarray(texts), k_cand, axis=0)  # (B*K, T)
        cond_k = jnp.repeat(cond, k_cand, axis=0)
        res = tts._generate(cond_k, texts_k, key, settings)
        s_gen = res.codes.shape[1]
        code_mask = (jnp.arange(s_gen)[None, :]
                     < res.lengths[:, None]).astype(jnp.int32)
        scores = tts._clvp_rerank_batch_jit(
            tts.vars["clvp"], jnp.asarray(texts),
            jnp.clip(res.codes, 0,
                     cfg.clvp.num_speech_tokens - 1).reshape(b, k_cand, s_gen),
            code_mask=code_mask.reshape(b, k_cand, s_gen))
        # winner selection stays ON DEVICE: only the (B,) lengths ever reach
        # the host before the render dispatch (each sync pays the tunnel RTT)
        best = jnp.argmax(scores, axis=1)                           # (B,)
        codes_dev = jnp.take_along_axis(
            res.codes.reshape(b, k_cand, s_gen),
            best[:, None, None], axis=1)[:, 0]
        lengths_dev = jnp.take_along_axis(
            res.lengths.reshape(b, k_cand), best[:, None], axis=1)[:, 0]
    else:
        res = tts._generate(cond, jnp.asarray(texts), key, settings)
        codes_dev, lengths_dev = res.codes, res.lengths
    if use_hifigan:
        if any(r.spk_mel16 is not None for r in requests):
            per = [r.spk_mel16 if r.spk_mel16 is not None else spk_mel16
                   for r in requests]
            shapes = {tuple(s.shape) for s in per}
            if len(shapes) != 1:
                raise ValueError(
                    "per-request spk_mel16s must share one shape (use "
                    f"speaker_mel_from_wav, bucketed); got {sorted(shapes)}")
            spk_mel16 = jnp.concatenate(per, axis=0)

    text_lens = jnp.asarray([len(r.text_tokens) for r in requests], np.int32)
    wavs = render_rows(tts, jnp.asarray(texts), text_lens, cond, codes_dev,
                       np.asarray(lengths_dev), settings, use_diffusion, key,
                       use_hifigan=use_hifigan, spk_mel16=spk_mel16)
    return wavs[:n_real]


def render_rows(tts: TextToSpeech, texts, text_lens, cond, codes_dev,
                lengths: np.ndarray, settings: TTSSettings,
                use_diffusion: bool, key,
                use_hifigan: bool = False, spk_mel16=None
                ) -> List[np.ndarray]:
    """Render B generated rows to per-row trimmed waveforms — the batched
    render stage shared by wave serving (synthesize_batch) and continuous
    batching (slots.ContinuousBatcher).

    texts (B, Tt) framed tokens; text_lens (B,) true lengths; cond
    (B, mel, T) conditioning mels; codes_dev (B, S) raw generated codes
    (device or host); lengths (B,) generated lengths INCL the stop token
    (GenerateResult.lengths). Strips the trailing 2 codes (test.py:150),
    buckets, and runs ONE render program for the batch."""
    cfg = tts.cfg
    ns = np.maximum(lengths - 2, 1)
    n_b = bucket_len(int(ns.max()), tts._code_buckets())
    codes = tts._pad_codes_jit(jnp.asarray(codes_dev),
                               jnp.asarray(np.minimum(ns, n_b), jnp.int32),
                               n_b=n_b)
    hop = cfg.vocos.hop_length
    comp = cfg.vqvae.compression
    b = codes.shape[0]

    if use_hifigan:
        if tts.hifigan is None or "hifigan" not in tts.vars:
            raise ValueError("use_hifigan needs TextToSpeech(with_hifigan=True)")
        if spk_mel16 is None:
            raise ValueError("use_hifigan needs spk_mel16 "
                             "(tts.speaker_mel_from_wav of the ref clip)")
        spk = (jnp.tile(spk_mel16, (b, 1, 1))
               if spk_mel16.shape[0] == 1 else spk_mel16)
        wav = np.asarray(tts._render_hifigan_jit(
            tts.vars["gpt"], tts.vars["hifigan"], cond, texts, text_lens,
            codes,
            jnp.asarray(ns * cfg.gpt.mel_length_compression, jnp.int32), spk))
        from xtts_tpu.models.hifigan import hifigan_samples
        return [wav[i, :hifigan_samples(cfg.hifigan, int(ns[i]))]
                for i in range(b)]

    if not use_diffusion:
        wav, _ = tts._render_shortcut_jit(tts.vars["dvae"],
                                          tts.vars["vocos"], codes)
        wav = np.asarray(wav)
    else:
        from xtts_tpu.models.aa_diffusion import normalize_tacotron_mel
        if key.ndim == 2:
            k2 = key          # per-row keys (B, 2): pure per-row noise —
            #                   _diffusion_mel_impl does the row splits
        else:
            key, k2 = jax.random.split(key)
        # multi-clip stacked cond: ReferenceNet/CLIP refer = first clip
        diff_cond = cond if cond.ndim == 3 else cond[:, 0]
        # latent extract + 50-step CFG diffusion + vocos in ONE program
        # (two fewer ~20 ms tunnel dispatches per batch — PERF.md)
        wav = np.asarray(tts._render_full_jit(
            tts.vars["gpt"], tts.vars["diffusion"], tts.vars["vocos"],
            cond, normalize_tacotron_mel(diff_cond), texts, text_lens,
            codes,
            jnp.asarray(ns * cfg.gpt.mel_length_compression, jnp.int32), k2,
            settings.diffusion_temperature,
            steps=settings.diffusion_steps, sampler=settings.sampler,
            cond_free_k=settings.cond_free_k,
            refnet_interval=settings.refnet_interval))

    return [wav[i, :int(ns[i]) * comp * hop] for i in range(b)]


class ServerBusy(RuntimeError):
    """submit() rejected: the server's pending queue is full (backpressure —
    fail fast instead of growing the queue unboundedly; HTTP fronts map
    this to 503)."""


class BatchServer:
    """Microbatching synthesis front-end.

    submit() is thread-safe and returns a concurrent.futures.Future that
    resolves to the waveform. Requests arriving within `window_ms` of each
    other are packed into one device program (up to `max_batch`).
    """

    def __init__(self, tts: TextToSpeech, cond_mel: jnp.ndarray,
                 settings: TTSSettings = TTSSettings(),
                 max_batch: int = 8, window_ms: float = 20.0,
                 use_diffusion: bool = False,
                 use_hifigan: bool = False,
                 spk_mel16: Optional[jnp.ndarray] = None,
                 batch_buckets: Optional[Sequence[int]] = None,
                 max_pending: Optional[int] = None,
                 request_timeout_s: Optional[float] = None):
        """batch_buckets: row-count buckets (see synthesize_batch) — bounds
        the number of compiled programs to len(batch_buckets) per text
        bucket instead of one per distinct arrival count, and makes
        warmup() able to precompile the whole grid up front.

        max_pending: queue-depth bound — submit() raises ServerBusy once
        this many requests wait unpacked (default None = unbounded, the
        pre-round-4 behavior). request_timeout_s: a request that waits in
        the queue longer than this fails with TimeoutError instead of
        occupying a wave (the client's Future.result(timeout=) only stops
        the CLIENT waiting; this stops the SERVER doing abandoned work)."""
        self.tts = tts
        self.cond_mel = cond_mel
        self.settings = settings
        self.max_batch = max_batch
        self.window = window_ms / 1000.0
        self.use_diffusion = use_diffusion
        self.use_hifigan = use_hifigan
        self.spk_mel16 = spk_mel16
        self.batch_buckets = (tuple(b for b in batch_buckets
                                    if b <= max_batch)
                              if batch_buckets else None)
        self.max_pending = max_pending
        self.request_timeout_s = request_timeout_s
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._seq = 0
        self._m = {"completed": 0, "failed": 0, "waves": 0, "timed_out": 0,
                   "rows_sum": 0, "latency_sum": 0.0, "latency_max": 0.0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, text_tokens: np.ndarray,
               cond_mel: Optional[jnp.ndarray] = None,
               spk_mel16: Optional[jnp.ndarray] = None
               ) -> "Future[np.ndarray]":
        """cond_mel: optional per-request voice ((1, mel, T), shared T
        across a batch — see SynthesisRequest.cond_mel); None uses the
        server's default voice. spk_mel16: per-request speaker mel for the
        hifigan renderer. Requests with different cond/spk shapes are
        grouped into separate device programs, so a mismatched tenant
        never fails its co-batched neighbors."""
        if self._stop.is_set():
            raise RuntimeError("BatchServer is closed")
        toks = np.asarray(text_tokens, np.int32)
        cap = self.tts.cfg.gpt.max_text_tokens
        if toks.shape[-1] > cap:
            # reject HERE (caller's thread) — past the queue it would raise
            # inside the worker's device program and fail every co-batched
            # request's future along with it
            raise ValueError(
                f"text of {toks.shape[-1]} tokens exceeds "
                f"max_text_tokens={cap}; split the text "
                f"(TextToSpeech.tts() sentence-splits and truncates)")
        if (self.max_pending is not None
                and self._q.qsize() >= self.max_pending):
            # fail fast (503 at the HTTP layer) — an unbounded queue turns
            # overload into silent latency growth and memory creep
            raise ServerBusy(
                f"pending queue full ({self.max_pending} requests)")
        fut: "Future[np.ndarray]" = Future()
        self._q.put((toks, cond_mel, spk_mel16, fut, time.perf_counter()))
        return fut

    def pending(self) -> int:
        """Requests submitted but not yet packed into a device program
        (health/observability surface for serving fronts)."""
        return self._q.qsize()

    def stats(self) -> dict:
        """Serving metrics snapshot: completed/failed counts, mean/max
        submit->result latency, waves run, mean rows per wave."""
        m = dict(self._m)
        m.pop("latency_sum")
        m["latency_mean_s"] = round(
            self._m["latency_sum"] / max(m["completed"], 1), 4)
        m["latency_max_s"] = round(m.pop("latency_max"), 4)
        m["rows_per_wave"] = round(
            m.pop("rows_sum") / max(m["waves"], 1), 2)
        m["pending"] = self._q.qsize()
        # hanzi the G2P lexicon could not voice (dropped from synthesis) —
        # process-cumulative, so serving fronts can alarm on silently
        # unspeakable input (VERDICT r3 item 3b)
        from xtts_tpu.text.chinese import oov_stats
        m["oov_dropped"] = sum(oov_stats().values())
        return m

    def warmup(self, text_lens: Optional[Sequence[int]] = None,
               batch_sizes: Optional[Sequence[int]] = None) -> int:
        """Precompile the serving programs for the expected shape grid.

        Drives synthesize_batch synchronously (same jit caches as the
        worker thread — one process, one chip) for every (batch bucket,
        text bucket) pair, so the first real requests hit warm executables
        instead of paying multi-minute tunnel compiles. Defaults: this
        server's batch_buckets (or max_batch when unbucketed) x all text
        buckets. The render compiles at whatever code bucket the warmup
        generation lands in — near the max_mel_tokens cap with random or
        peaked weights, which is also the bucket speculative_render uses.
        Returns the number of programs driven. Call before serving
        traffic; running it concurrently with traffic is safe but the
        device serializes the programs."""
        cfg = self.tts.cfg
        if text_lens is None:
            text_lens = (16, 32, 64, 128, 256, cfg.gpt.max_text_tokens)
        bs = tuple(batch_sizes or self.batch_buckets or (self.max_batch,))
        n = 0
        for b in bs:
            for t in text_lens:
                toks = np.ones((min(t, cfg.gpt.max_text_tokens),), np.int32)
                reqs = [SynthesisRequest(toks)] * b
                synthesize_batch(self.tts, reqs, self.cond_mel,
                                 self.settings,
                                 use_diffusion=self.use_diffusion,
                                 use_hifigan=self.use_hifigan,
                                 spk_mel16=self.spk_mel16,
                                 key=jax.random.PRNGKey(0))
                n += 1
        return n

    def close(self):
        """Stop the worker; requests still queued (submitted but never
        packed into a device program) get their futures CANCELLED rather
        than left pending forever."""
        self._stop.set()
        self._thread.join(timeout=5)
        try:
            while True:
                item = self._q.get_nowait()
                item[3].cancel()
        except queue.Empty:
            pass

    # ------------------------------------------------------------------

    def _collect(self):
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.window
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            if self.request_timeout_s is not None:
                now = time.perf_counter()
                live = []
                for item in batch:
                    if now - item[4] > self.request_timeout_s:
                        if not item[3].done():
                            item[3].set_exception(TimeoutError(
                                f"request waited "
                                f"{now - item[4]:.1f}s in queue "
                                f"(> {self.request_timeout_s}s)"))
                        self._m["timed_out"] += 1
                    else:
                        live.append(item)
                batch = live
                if not batch:
                    continue
            # group by (cond shape, spk shape): per-request conds must share
            # shapes within one program; grouping keeps a mismatched tenant
            # from failing its co-batched neighbors
            groups: dict = {}
            for t, c, s, f, t0 in batch:
                gk = (None if c is None else tuple(c.shape),
                      None if s is None else tuple(s.shape))
                groups.setdefault(gk, []).append((t, c, s, f, t0))
            for items in groups.values():
                reqs = [SynthesisRequest(t, cond_mel=c, spk_mel16=s)
                        for t, c, s, _, _ in items]
                futs = [f for _, _, _, f, _ in items]
                t0s = [t0 for *_, t0 in items]
                self._seq += 1
                self._m["waves"] += 1
                self._m["rows_sum"] += len(items)
                try:
                    wavs = synthesize_batch(
                        self.tts, reqs,
                        self.cond_mel, self.settings,
                        use_diffusion=self.use_diffusion,
                        use_hifigan=self.use_hifigan,
                        spk_mel16=self.spk_mel16,
                        batch_buckets=self.batch_buckets,
                        key=jax.random.PRNGKey(self._seq))
                    now = time.perf_counter()
                    for f, w, t0 in zip(futs, wavs, t0s):
                        if not f.cancelled():  # client gave up mid-batch
                            f.set_result(w)
                            lat = now - t0
                            self._m["completed"] += 1
                            self._m["latency_sum"] += lat
                            self._m["latency_max"] = max(
                                self._m["latency_max"], lat)
                except Exception as e:  # pragma: no cover - defensive
                    for f in futs:
                        if not f.done():
                            f.set_exception(e)
                            self._m["failed"] += 1
