"""Continuous batching (slot serving): per-row decode with mid-stream refill.

Wave serving (serving.synthesize_batch / BatchServer) holds a batch until
its slowest row finishes, and compacting waves (infer/compact.py) only
shrink — a finished row's capacity is lost to the wave. This module is the
full production pattern on TPU terms: a fixed pool of B decode SLOTS over
one preallocated KV cache, each slot carrying its OWN prefix length and
position counters, decoded in fixed-length segments; between segments the
host syncs the tiny (B,) done mask, harvests finished rows, and PREFILLS
new requests into the freed slots while the other rows keep decoding. The
chip never waits for a wave barrier: steady-state throughput is set by the
per-step cost at full B, not by the slowest utterance.

vLLM-style page tables are gather/scatter-shaped memory ops XLA cannot
tile on TPU; here every shape is static — the cache is (L, B, S_max, H,
hd), per-row positions are data, and refill is a dynamic_update_slice of a
freshly prefilled prefix into the slot's row. No reference counterpart
(the reference generates at fixed batch via HF generate,
ttts/gpt/model.py:588).

Exactness: greedy decode of every request is TOKEN-EXACT vs the B=1
monolithic engine on the same padded text (row math is independent;
masked positions contribute exact zeros — same argument as the cache
ladder, tests/test_slots.py). Sampled rows carry PER-ROW key chains
(sampling.sample_token_rows), so a request's sampled AR CODES are a pure
function of its own (text, voice, key) — reproducible no matter what
else shares the pool, a determinism property wave batching cannot offer
(its batched draw changes with batch shape/composition). Deterministic
renders (shortcut DVAE+Vocos, hifigan) inherit that; the DIFFUSION render
draws its noise from a per-row chain derived from the request key
(fold_in(key, _RENDER_FOLD)) and rows group by their OWN code bucket, so
keyed diffusion waveforms are traffic-independent too
(tests/test_slots.py pins byte-identity across pool compositions).

Engine: the int8 XLA chain (qdecode tree — the serving default). The
per-row step mirrors qdecode._decode_step numerics exactly with per-row
cache writes (one-position scatters) and per-row valid masks.
"""
from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.infer.qdecode import _layer_norm, qdot
from xtts_tpu.infer.sampling import greedy_token, sample_token_rows
from xtts_tpu.nn.transformer import KVCache, NEG_INF, gelu_new

# fold_in namespace separating a request's RENDER noise chain from its AR
# candidate chains (candidate i uses fold_in(key, i), i < num_candidates)
_RENDER_FOLD = 0x52454E44  # "REND"


class SlotState(NamedTuple):
    """Device-side slot pool. Positions are data, shapes are static."""
    # cache: (kc, vc) bf16, or (kc, vc, ks, vs) per-(position, head) int8
    # row-quantized values + f32 scales (settings.kv_quant — halves the
    # dominant byte stream: every slot step reads the full S_max cache)
    cache: tuple
    pos: jnp.ndarray      # (B,) int32 — next cache write index (p_len + gen)
    gen: jnp.ndarray      # (B,) int32 — tokens generated (incl. stop)
    plen: jnp.ndarray     # (B,) int32 — the slot's prefix length
    logits: jnp.ndarray   # (B, V) f32 — next-token logits
    done: jnp.ndarray     # (B,) bool — finished or empty
    seen: jnp.ndarray     # (B, V) bool — repetition-penalty id set
    codes: jnp.ndarray    # (B, max_gen) int32, stop-padded
    keys: jnp.ndarray     # (B, 2) uint32 — PER-ROW RNG chains: a request's
                          # sampled output is reproducible regardless of
                          # what else shares the pool (wave batching cannot
                          # offer this: a shared-key batched draw changes
                          # with batch shape/composition)


def _decode_step_rows(qt: Dict[str, Any], heads: int, x: jnp.ndarray,
                      cache: tuple, pos: jnp.ndarray):
    """qdecode._decode_step with PER-ROW cache positions: x (B, D) bf16,
    writes each row's K/V at its own `pos`, masks attention per row.
    cache (kc, vc) runs bf16; (kc, vc, ks, vs) mirrors
    qdecode._decode_step_qkv — int8 values consumed through a bare convert
    (operand-fusible), per-(position, head) scales folded into the
    scores/probs."""
    b, d = x.shape
    hd = d // heads
    scale = 1.0 / np.sqrt(hd)
    rows = jnp.arange(b)
    quant = len(cache) == 4
    kc, vc = cache[0], cache[1]
    ks, vs = (cache[2], cache[3]) if quant else (None, None)
    s = kc.shape[2]
    grid = jnp.arange(s)[None, None, :]
    for li, lp in enumerate(qt["layers"]):
        h = _layer_norm(x, lp["ln_1"]).astype(jnp.bfloat16)
        qkv = qdot(h, lp["qkv"], lp["qkv_b"])            # (B, 3D) f32
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, heads, hd)
        k = k.reshape(b, heads, hd)
        v = v.reshape(b, heads, hd)
        if quant:
            from xtts_tpu.infer.qdecode import _quant_heads
            kq, ksc = _quant_heads(k)
            vq, vsc = _quant_heads(v)
            kc = kc.at[li, rows, pos].set(kq)
            vc = vc.at[li, rows, pos].set(vq)
            ks = ks.at[li, rows, pos].set(ksc)
            vs = vs.at[li, rows, pos].set(vsc)
        else:
            kc = kc.at[li, rows, pos].set(k.astype(kc.dtype))
            vc = vc.at[li, rows, pos].set(v.astype(vc.dtype))
        att = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.bfloat16),
                         kc[li].astype(jnp.bfloat16))
        if quant:
            att = att * jnp.swapaxes(ks[li], 1, 2)
        att = att * scale
        att = jnp.where(grid <= pos[:, None, None], att, NEG_INF)
        w = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
        if quant:
            w = w * jnp.swapaxes(vs[li], 1, 2)
        a = jnp.einsum("bhs,bshd->bhd", w.astype(jnp.bfloat16),
                       vc[li].astype(jnp.bfloat16)).reshape(b, d)
        x = x + qdot(a, lp["proj"], lp["proj_b"]).astype(x.dtype)
        h2 = _layer_norm(x, lp["ln_2"]).astype(jnp.bfloat16)
        m = gelu_new(qdot(h2, lp["fc"], lp["fc_b"])).astype(jnp.bfloat16)
        x = x + qdot(m, lp["out"], lp["out_b"]).astype(x.dtype)
    normed = _layer_norm(x, qt["ln_f"])
    cache = (kc, vc, ks, vs) if quant else (kc, vc)
    return normed, cache


def _decode_logits_rows(qt, heads: int, tok: jnp.ndarray, mel_pos: jnp.ndarray,
                        cache: tuple, pos):
    """Token (B,) at per-row mel positions -> (logits (B, V) f32, cache)."""
    emb = qt["mel_embedding"][tok] + qt["mel_pos_embedding"][mel_pos]
    normed, cache = _decode_step_rows(qt, heads, emb.astype(jnp.bfloat16),
                                      cache, pos)
    final = _layer_norm(normed.astype(jnp.bfloat16), qt["final_norm"])
    logits = qdot(final.astype(jnp.bfloat16), qt["mel_head"],
                  qt["mel_head_b"])
    return logits, cache


@functools.partial(jax.jit, static_argnames=(
    "heads", "pos_off", "max_gen", "steps", "stop", "do_sample", "top_p",
    "temperature", "repetition_penalty", "typical_mass"),
                   donate_argnames=("state",))
def _run_segment(qtree, state: SlotState, heads: int, pos_off: int,
                 max_gen: int, steps: int, stop: int, do_sample: bool,
                 top_p: float, temperature: float, repetition_penalty: float,
                 typical_mass: Optional[float]) -> SlotState:
    """Decode `steps` tokens for every live slot (done slots idle: their
    sampled token is forced to stop, their counters freeze, and their
    writes land on already-final or masked positions)."""
    b = state.done.shape[0]
    rows = jnp.arange(b)
    s_max = state.cache[0].shape[2]

    def body(st: SlotState, _):
        splits = jax.vmap(jax.random.split)(st.keys)     # (B, 2, 2)
        keys, subs = splits[:, 0], splits[:, 1]
        if do_sample:
            tok = sample_token_rows(subs, st.logits, temperature=temperature,
                                    top_p=top_p, seen=st.seen,
                                    repetition_penalty=repetition_penalty,
                                    typical_mass=typical_mass)
        else:
            tok = greedy_token(st.logits)
        idle = st.done
        tok = jnp.where(idle, stop, tok)
        col = jnp.minimum(st.gen, max_gen - 1)
        # idle rows must NOT overwrite their final column (a row that hit
        # the cap holds a real token at max_gen-1)
        codes = st.codes.at[rows, col].set(
            jnp.where(idle, st.codes[rows, col], tok))
        seen = st.seen.at[rows, tok].set(True)
        now_done = idle | (tok == stop)
        gen = jnp.where(idle, st.gen, st.gen + 1)
        now_done = now_done | (gen >= max_gen)
        # token with gen index g embeds at mel position g+1(+n_cond quirk)
        # and its K/V land at cache index plen+g — the per-row counters
        mel_pos = jnp.clip(st.gen + 1 + pos_off, 0, None)
        wpos = jnp.minimum(st.pos, s_max - 1)   # idle rows clamp in-bounds
        logits, cache = _decode_logits_rows(qtree, heads, tok, mel_pos,
                                            st.cache, wpos)
        pos = jnp.where(idle, st.pos, st.pos + 1)
        return SlotState(cache, pos, gen, st.plen,
                         logits.astype(jnp.float32), now_done, seen, codes,
                         keys), None

    # bounded while_loop rather than scan: an all-done pool (drain phase,
    # or every live row stopping mid-segment) exits early instead of
    # burning the rest of the segment on idle writes. Exactness is
    # unaffected — idle steps only rewrite stop over stop and freeze
    # counters, and per-row keys are reseeded at install.
    def cond_fn(st_i):
        i, st = st_i
        return (i < steps) & ~jnp.all(st.done)

    def body_i(st_i):
        i, st = st_i
        st, _ = body(st, None)
        return (i + 1, st)

    _, state = jax.lax.while_loop(cond_fn, body_i, (jnp.int32(0), state))
    return state


@functools.partial(jax.jit, static_argnames=("model",),
                   donate_argnames=("state",))
def _install(model, variables, state: SlotState, cond_mel, text_tokens,
             slot, key) -> SlotState:
    """Prefill one request (B=1 flax pass — compute-bound, bf16) and write
    it into `slot`: prefix K/V into the row's cache positions [0, p_len),
    counters/logits/seen/codes reset, the row's RNG chain seeded with the
    request's own `key`. Compiles once per text bucket. A 4-tuple (int8)
    state cache additionally quantizes the prefix rows at install
    (qdecode.quantize_kv math)."""
    cfg = model.cfg
    prefix, _ = model.apply(variables, cond_mel, text_tokens,
                            method=model.encode_prefix)
    _, p_len, _ = prefix.shape
    tmp = KVCache.zeros(cfg.layers, 1, p_len, cfg.heads,
                        cfg.model_dim // cfg.heads, dtype=jnp.bfloat16)
    logits0, tmp = model.apply(variables, prefix, tmp, method=model.prefill)
    if len(state.cache) == 4:
        from xtts_tpu.infer.qdecode import quantize_kv
        qtmp = quantize_kv(tmp)
        cache = tuple(
            jax.lax.dynamic_update_slice(dst, new, (0, slot) + (0,) * (dst.ndim - 2))
            for dst, new in zip(state.cache, qtmp))
    else:
        cache = (
            jax.lax.dynamic_update_slice(state.cache[0], tmp.k,
                                         (0, slot, 0, 0, 0)),
            jax.lax.dynamic_update_slice(state.cache[1], tmp.v,
                                         (0, slot, 0, 0, 0)))
    seen = state.seen.at[slot].set(False)
    seen = seen.at[slot, 1].set(True).at[slot, cfg.start_mel_token].set(True)
    return SlotState(
        cache,
        state.pos.at[slot].set(p_len),
        state.gen.at[slot].set(0),
        state.plen.at[slot].set(p_len),
        state.logits.at[slot].set(logits0[0].astype(jnp.float32)),
        state.done.at[slot].set(False),
        seen,
        state.codes.at[slot].set(model.cfg.stop_mel_token),
        state.keys.at[slot].set(key))


class SlotDecoder:
    """Device-facing half of continuous batching: owns the SlotState and
    the three programs (install / segment / fetch).

    Requires TextToSpeech(quantized_decode=True) — the per-row engine is
    built on the int8 qtree (the serving default, BENCH_QUANT=1)."""

    def __init__(self, tts, n_slots: int = 16, max_gen: int = 600,
                 segment_len: int = 32,
                 text_buckets: Optional[Sequence[int]] = None,
                 settings=None):
        from xtts_tpu.infer.api import TTSSettings
        if getattr(tts, "_qtree", None) is None:
            raise ValueError("SlotDecoder needs TextToSpeech("
                             "quantized_decode=True)")
        self.tts = tts
        cfg = tts.cfg.gpt
        self.cfg = cfg
        self.settings = settings or TTSSettings(max_mel_tokens=max_gen)
        self.max_gen = max_gen
        self.segment_len = segment_len
        self.n_slots = n_slots
        self.text_buckets = tuple(
            b for b in (text_buckets or (16, 32, 64, 128, 256,
                                         cfg.max_text_tokens))
            if b <= cfg.max_text_tokens) or (cfg.max_text_tokens,)
        self.n_cond = cfg.perceiver_latents if cfg.use_perceiver else 1
        self.pos_off = self.n_cond if cfg.decode_position_quirk else 0
        # S_max: prefix at the largest text bucket + the generation cap.
        # p_len = n_cond + (text+1 framed stop + start/stop alignment) + the
        # fake-input tail — discovered statically via eval_shape (free).
        tmax = self.text_buckets[-1]
        shp = jax.eval_shape(
            functools.partial(tts.gpt.apply, method=tts.gpt.encode_prefix),
            tts.vars["gpt"],
            jax.ShapeDtypeStruct((1, tts.cfg.mel.n_mels, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, tmax), jnp.int32))
        self.p_len_max = shp[0].shape[1]
        self.s_max = self.p_len_max + max_gen
        self.state = self._fresh_state()
        self._install_seq = 0

    def _fresh_state(self) -> SlotState:
        cfg = self.cfg
        b, v = self.n_slots, cfg.number_mel_codes
        hd = cfg.model_dim // cfg.heads
        cshape = (cfg.layers, b, self.s_max, cfg.heads, hd)
        if self.settings.kv_quant:
            # int8 row-quantized pool: halves the dominant byte stream
            # (every slot step reads the full S_max cache)
            cache = (jnp.zeros(cshape, jnp.int8), jnp.zeros(cshape, jnp.int8),
                     jnp.zeros(cshape[:-1], jnp.float32),
                     jnp.zeros(cshape[:-1], jnp.float32))
        else:
            cache = (jnp.zeros(cshape, jnp.bfloat16),
                     jnp.zeros(cshape, jnp.bfloat16))
        return SlotState(
            cache,
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b, v), float(NEG_INF), jnp.float32),
            jnp.ones((b,), bool),              # empty slots idle as "done"
            jnp.zeros((b, v), bool),
            jnp.full((b, self.max_gen), cfg.stop_mel_token, jnp.int32),
            jnp.tile(jax.random.PRNGKey(0)[None], (b, 1)))

    def reset(self) -> None:
        """Drop all slot state (e.g. after a poisoned-pool error)."""
        self.state = self._fresh_state()

    def pad_text(self, text_tokens: np.ndarray) -> np.ndarray:
        """Pad a (T,) request to its text bucket with stop_text_token (the
        same framing wave serving uses — serving._pad_texts)."""
        from xtts_tpu.infer.api import bucket_len
        t = np.asarray(text_tokens, np.int32)
        tb = bucket_len(len(t), self.text_buckets)
        out = np.full((tb,), self.cfg.stop_text_token, np.int32)
        out[:min(len(t), tb)] = t[:tb]
        return out

    def install(self, slot: int, text_tokens: np.ndarray,
                cond_mel: jnp.ndarray,
                key: Optional[jax.Array] = None) -> None:
        """Prefill `text_tokens` (pre-padded via pad_text) with `cond_mel`
        (1, mel, T) into `slot`. Dispatch only — no host sync. `key` seeds
        the slot's OWN RNG chain: the request's sampled output is then a
        pure function of (text, voice, key), independent of pool traffic
        (default: a fresh key per install)."""
        if key is None:
            self._install_seq += 1
            key = jax.random.PRNGKey(self._install_seq)
        self.state = _install(self.tts.gpt, self.tts.vars["gpt"], self.state,
                              cond_mel, jnp.asarray(text_tokens)[None],
                              jnp.int32(slot), key)

    def dispatch_segment(self, greedy: bool = False) -> jnp.ndarray:
        """Dispatch one decode segment and return the packed (done|gen)
        device array WITHOUT syncing — the caller can overlap the ~20 ms
        tunnel RTT of the host read with further dispatches (the scheduler
        pipelines segment N+1 behind segment N's sync)."""
        s = self.settings
        self.state = _run_segment(
            self.tts._qtree, self.state, heads=self.cfg.heads,
            pos_off=self.pos_off, max_gen=self.max_gen,
            steps=self.segment_len, stop=self.cfg.stop_mel_token,
            do_sample=not greedy,
            top_p=1.0 if greedy else s.top_p,
            temperature=1.0 if greedy else s.temperature,
            repetition_penalty=1.0 if greedy else s.repetition_penalty,
            typical_mass=None)
        return jnp.concatenate(
            [self.state.done.astype(jnp.int32), self.state.gen])

    def read_packed(self, packed) -> Tuple[np.ndarray, np.ndarray]:
        p = np.asarray(packed)
        return p[:self.n_slots].astype(bool), p[self.n_slots:]

    def run_segment(self, greedy: bool = False
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Decode segment_len tokens for all slots; returns (done, gen) —
        the loop's ONE host sync. greedy=True is token-exact vs the B=1
        monolithic engine."""
        return self.read_packed(self.dispatch_segment(greedy))

    def run_segment_greedy(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.run_segment(greedy=True)

    def fetch_codes(self) -> np.ndarray:
        """(B, max_gen) codes snapshot (host sync; ~max_gen*B*4 bytes)."""
        return np.asarray(self.state.codes)


@dataclass
class _Group:
    """One request: K candidate decodes sharing a text/voice/future."""
    text: np.ndarray                 # bucket-padded tokens
    raw_len: int
    cond_mel: Optional[jnp.ndarray]
    key: Optional[jax.Array]         # request RNG seed (candidate i uses
                                     # fold_in(key, i)); None = fresh keys
    future: "Future"
    need: int                        # K candidates outstanding
    cands: list                      # harvested (codes_row, gen) pairs
    launched: int = 0                # candidates installed so far
    t_submit: float = 0.0            # perf_counter at submit (latency stat)


class ContinuousBatcher:
    """Host half: a scheduler thread that keeps the slot pool full.

    submit() returns a Future resolving to the rendered waveform. Finished
    rows are harvested between segments, grouped, and rendered through the
    same batched render programs wave serving uses (serving.render_rows).

    settings.num_candidates K > 1 decodes K candidate rows per request
    (they microbatch with everything else in the pool — no wave of K),
    reranks the harvested candidates with CLVP (rerank_batch, the
    ttts/api.py:397-412 semantics), and renders only each winner."""

    def __init__(self, tts, cond_mel: jnp.ndarray, settings=None,
                 n_slots: int = 16, max_gen: Optional[int] = None,
                 segment_len: int = 32, use_diffusion: bool = False,
                 render_min: int = 4,
                 render_buckets: Sequence[int] = (1, 2, 4, 8, 16),
                 pipeline: bool = True,
                 max_pending: Optional[int] = None,
                 request_timeout_s: Optional[float] = None):
        """pipeline: dispatch segment N+1 before syncing segment N's done
        mask, so the chip never idles during the ~20 ms tunnel RTT of the
        host read. Refills then lag one segment (a freed slot idles one
        extra segment before its new occupant starts); per-request results
        are unchanged (per-row state, frozen done rows).

        max_pending: candidate-queue depth bound — submit() raises
        serving.ServerBusy when the K candidates wouldn't fit (backpressure;
        503 at the HTTP layer). request_timeout_s: a request still fully
        queued (no candidate installed) after this long fails with
        TimeoutError instead of ever taking slots."""
        from xtts_tpu.infer.api import TTSSettings
        self.settings = settings or TTSSettings()
        if (self.settings.num_candidates > 1
                and (tts.clvp is None or "clvp" not in tts.vars)):
            raise ValueError("settings.num_candidates > 1 needs "
                             "TextToSpeech(with_clvp=True) for the rerank")
        self.tts = tts
        self.cond_mel = cond_mel
        self.use_diffusion = use_diffusion
        self.render_min = render_min
        self.render_buckets = tuple(sorted(render_buckets))
        self.dec = SlotDecoder(
            tts, n_slots=n_slots,
            max_gen=max_gen or self.settings.max_mel_tokens,
            segment_len=segment_len, settings=self.settings)
        self.max_pending = max_pending
        self.request_timeout_s = request_timeout_s
        self._q: "queue.Queue[_Group]" = queue.Queue()
        self._slot_req: List[Optional[_Group]] = [None] * n_slots
        self._finished: List[Tuple[_Group, np.ndarray, int]] = []
        self._stop = threading.Event()
        self._seq = 0
        self.pipeline = pipeline
        self._inflight = None      # dispatched-but-unread packed (done|gen)
        # serving metrics (stats()): completed requests, latency sum/max,
        # segments run, live-row-step counts for slot utilization
        self._m = {"completed": 0, "failed": 0, "timed_out": 0,
                   "latency_sum": 0.0,
                   "latency_max": 0.0, "segments": 0, "live_row_steps": 0,
                   "row_steps": 0, "tokens": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def warmup(self, text_lens: Optional[Sequence[int]] = None,
               render_sizes: Optional[Sequence[int]] = None) -> int:
        """Precompile the slot-serving programs before traffic: one install
        per text bucket, the segment program, and one render per (render
        bucket x text bucket) at the cap code bucket — the analogue of
        BatchServer.warmup. Drives REAL dummy requests through submit()
        (the pool is drained between grid points), so call before serving.
        Render programs compile at whichever render_buckets rungs the
        bursts exercise; the rung set bounds the total compile count either
        way. Returns the number of requests driven."""
        text_lens = tuple(text_lens or self.dec.text_buckets)
        render_sizes = tuple(render_sizes or self.render_buckets)
        n = 0
        for t in text_lens:
            for rb in render_sizes:
                if rb > self.dec.n_slots * 2:
                    continue   # a burst this size can't accumulate anyway
                toks = np.ones((min(t, self.tts.cfg.gpt.max_text_tokens),),
                               np.int32)
                futs = [self.submit(toks) for _ in range(rb)]
                for f in futs:
                    f.result()
                n += rb
        return n

    def submit(self, text_tokens: np.ndarray,
               cond_mel: Optional[jnp.ndarray] = None,
               key: Optional[jax.Array] = None) -> "Future[np.ndarray]":
        """key: optional request seed — with it, the request's output
        waveform is reproducible regardless of concurrent traffic: AR codes
        come from per-row RNG chains (candidate i of K draws from
        fold_in(key, i)), deterministic renders (shortcut DVAE+Vocos,
        hifigan) follow from the codes, and the diffusion render draws its
        noise from fold_in(key, _RENDER_FOLD) per row, grouped by the
        row's own code bucket (see _render). Without a key, fresh seeds
        are used per install/render."""
        if self._stop.is_set():
            raise RuntimeError("ContinuousBatcher is closed")
        toks = np.asarray(text_tokens, np.int32)
        cap = min(self.tts.cfg.gpt.max_text_tokens,
                  self.dec.text_buckets[-1])
        if toks.shape[-1] > cap:
            raise ValueError(
                f"text of {toks.shape[-1]} tokens exceeds this pool's "
                f"limit {cap} (max_text_tokens / largest text bucket) — "
                f"pad_text would silently truncate it")
        fut: "Future[np.ndarray]" = Future()
        k = self.settings.num_candidates
        if (self.max_pending is not None
                and self._q.qsize() + k > self.max_pending):
            from xtts_tpu.infer.serving import ServerBusy
            raise ServerBusy(
                f"pending candidate queue full ({self.max_pending})")
        import time as _time
        g = _Group(self.dec.pad_text(toks), len(toks), cond_mel, key, fut,
                   k, [], t_submit=_time.perf_counter())
        for _ in range(k):           # K candidate rows, independently slotted
            self._q.put(g)
        return fut

    def pending(self) -> int:
        """Candidate decodes not yet installed into a slot (observability;
        a request with num_candidates=K contributes up to K entries)."""
        return self._q.qsize()

    def stats(self) -> Dict[str, Any]:
        """Serving metrics snapshot: completed/failed request counts,
        mean/max submit->result latency, decoded tokens, segments run, and
        slot occupancy (occupied row-steps / total row-steps — the
        fraction of pool capacity holding requests)."""
        m = dict(self._m)
        m.pop("latency_sum")
        m["latency_mean_s"] = round(
            self._m["latency_sum"] / max(m["completed"], 1), 4)
        m["latency_max_s"] = round(m.pop("latency_max"), 4)
        # fraction of slot-steps spent holding a request (occupancy —
        # includes rows that finished mid-segment)
        m["slot_occupancy"] = round(
            self._m["live_row_steps"] / max(self._m["row_steps"], 1), 4)
        m.pop("live_row_steps"), m.pop("row_steps")
        m["pending"] = self._q.qsize()
        # process-cumulative count of hanzi dropped by the G2P lexicon
        # (no reading -> not synthesized); see serving.BatchServer.stats
        from xtts_tpu.text.chinese import oov_stats
        m["oov_dropped"] = sum(oov_stats().values())
        return m

    def close(self):
        self._stop.set()
        self._thread.join(timeout=10)
        try:
            while True:
                self._q.get_nowait().future.cancel()
        except queue.Empty:
            pass
        for p in self._slot_req:
            if p is not None and not p.future.done():
                p.future.cancel()

    # ------------------------------------------------------------------

    def _refill(self, free: List[int]) -> Tuple[List[int], List[int]]:
        import time as _time
        still_free, installed = [], []
        for slot in free:
            p = None
            while p is None:
                try:
                    p = self._q.get_nowait()
                except queue.Empty:
                    break
                if p.future.done():    # sibling candidate already failed
                    p = None
                    continue
                if (self.request_timeout_s is not None and p.launched == 0
                        and _time.perf_counter() - p.t_submit
                        > self.request_timeout_s):
                    # fully-queued request expired: fail it rather than
                    # spend slots on work the client has abandoned (its
                    # remaining queued candidates skip via future.done())
                    p.future.set_exception(TimeoutError(
                        f"request waited > {self.request_timeout_s}s "
                        f"queued"))
                    self._m["timed_out"] += 1
                    p = None
            if p is None:
                still_free.append(slot)
                continue
            self._seq += 1
            idx, p.launched = p.launched, p.launched + 1
            self._slot_req[slot] = p
            installed.append(slot)
            self.dec.install(slot, p.text,
                             p.cond_mel if p.cond_mel is not None
                             else self.cond_mel,
                             key=(None if p.key is None
                                  else jax.random.fold_in(p.key, idx)))
        return still_free, installed

    def _rerank(self, ready: List[_Group]):
        """CLVP-score each completed group's K candidates (one batched
        program per text length) and stage the winners for render."""
        tts = self.tts
        by_len: Dict[int, List[_Group]] = {}
        for g in ready:
            by_len.setdefault(len(g.text), []).append(g)
        from xtts_tpu.infer.api import bucket_len
        for groups in by_len.values():
            s = self.dec.max_gen
            # pad the group count to a render_buckets rung (repeat group 0,
            # extra scores dropped) — an unbucketed G would compile one
            # CLVP program per distinct harvest size (CLAUDE.md ladder rule)
            gb = bucket_len(len(groups), self.render_buckets)
            padded = groups + [groups[0]] * (gb - len(groups))
            texts = jnp.asarray(np.stack([g.text for g in padded]))
            codes = np.stack([np.stack([c for c, _ in g.cands])
                              for g in padded])          # (G, K, S)
            gens = np.stack([[n for _, n in g.cands] for g in padded])
            mask = (np.arange(s)[None, None, :]
                    < gens[:, :, None]).astype(np.int32)
            scores = np.asarray(tts._clvp_rerank_batch_jit(
                tts.vars["clvp"], texts,
                jnp.asarray(np.clip(codes, 0,
                                    tts.cfg.clvp.num_speech_tokens - 1)),
                code_mask=jnp.asarray(mask)))
            best = np.argmax(scores, axis=1)
            for g, b in zip(groups, best[:len(groups)]):
                self._finished.append((g, g.cands[b][0], int(g.cands[b][1])))

    def _render(self):
        """Render the harvested rows through the batched wave-render path,
        grouped by (text bucket, cond shape, own code bucket); the row count
        pads up to a render_buckets rung (repeating row 0, extra outputs
        dropped) so the compiled-program count stays bounded like
        synthesize_batch's batch_buckets.

        Determinism: rows group by their OWN code bucket (not the harvest
        max) and each row renders with its OWN noise key chain derived from
        the request key (fold_in(key, _RENDER_FOLD); per-row draws inside
        p_sample_loop/_diffusion_mel_impl) — so a keyed request's diffusion
        waveform is a pure function of (text, voice, key), independent of
        what else was in the pool. Exceeds the reference (batch-level noise
        in ttts/utils/diffusion.py:654-743)."""
        from xtts_tpu.infer.api import bucket_len
        from xtts_tpu.infer.serving import render_rows
        batch, self._finished = self._finished, []
        cbuckets = self.tts._code_buckets()
        groups: Dict[Any, list] = {}
        for p, codes, gen in batch:
            ck = (len(p.text),
                  None if p.cond_mel is None else tuple(p.cond_mel.shape),
                  bucket_len(max(int(gen) - 2, 1), cbuckets))
            groups.setdefault(ck, []).append((p, codes, gen))
        for items in groups.values():
            n_real = len(items)
            nb = bucket_len(n_real, self.render_buckets)
            padded = items + [items[0]] * (nb - n_real)
            texts = np.stack([p.text for p, _, _ in padded])
            lens = np.asarray([p.raw_len for p, _, _ in padded], np.int32)
            codes = np.stack([c for _, c, _ in padded])
            gens = np.asarray([g for _, _, g in padded], np.int32)
            cond = items[0][0].cond_mel
            conds = (jnp.concatenate([p.cond_mel for p, _, _ in padded], 0)
                     if cond is not None else
                     jnp.tile(self.cond_mel, (len(padded), 1, 1)))
            self._seq += 1
            row_keys = jnp.stack([
                (jax.random.fold_in(p.key, _RENDER_FOLD)
                 if p.key is not None else
                 jax.random.PRNGKey(self._seq * 1024 + i))
                for i, (p, _, _) in enumerate(padded)])
            try:
                wavs = render_rows(
                    self.tts, jnp.asarray(texts), jnp.asarray(lens), conds,
                    jnp.asarray(codes), gens, self.settings,
                    self.use_diffusion, row_keys)
                import time as _time
                now = _time.perf_counter()
                for (p, _, _), w in zip(items, wavs[:n_real]):
                    if not p.future.cancelled():   # client gave up mid-render
                        p.future.set_result(w)
                        lat = now - p.t_submit
                        self._m["completed"] += 1
                        self._m["latency_sum"] += lat
                        self._m["latency_max"] = max(self._m["latency_max"],
                                                     lat)
            except Exception as e:   # pragma: no cover - defensive
                for p, _, _ in items:
                    if not p.future.done():
                        p.future.set_exception(e)

    def _fail_inflight(self, exc: Exception):
        """A device/scheduler error poisons the whole pool state: fail every
        in-flight future (slots, harvested, queued), reset the pool, and
        keep the scheduler alive for new traffic (BatchServer fails only
        the offending batch; here the shared SlotState is the batch)."""
        for s, g in enumerate(self._slot_req):
            self._slot_req[s] = None
            if g is not None and not g.future.done():
                g.future.set_exception(exc)
                self._m["failed"] += 1
        for g, _, _ in self._finished:
            if not g.future.done():
                g.future.set_exception(exc)
        self._finished = []
        try:
            while True:
                g = self._q.get_nowait()
                if not g.future.done():
                    g.future.set_exception(exc)
        except queue.Empty:
            pass
        self._inflight = None
        self.dec.reset()

    def _loop(self):
        free = list(range(self.dec.n_slots))
        while not self._stop.is_set():
            try:
                free = self._step(free)
            except Exception as e:   # pragma: no cover - defensive
                self._fail_inflight(e)
                free = list(range(self.dec.n_slots))

    def _step(self, free: List[int]) -> List[int]:
        free, installed = self._refill(free)
        if len(free) == self.dec.n_slots and self._inflight is None:
            # pool empty: render stragglers, then park on the queue
            if self._finished:
                self._render()
            try:
                p = self._q.get(timeout=0.1)
                self._q.put(p)        # re-queue; _refill takes it
            except queue.Empty:
                pass
            return free
        packed = (self.dec.dispatch_segment()
                  if len(free) < self.dec.n_slots else None)
        stale_ok = ()
        if self.pipeline:
            # read LAST round's mask while this round's segment runs —
            # the host RTT overlaps device compute. That mask was
            # dispatched BEFORE this round's installs, so a slot refilled
            # this round still carries its OLD occupant's done flag there
            # — never harvest it from this (stale) mask.
            stale_ok = installed
            packed, self._inflight = self._inflight, packed
            if packed is None:
                return free
        done, gen = self.dec.read_packed(packed)
        self._m["segments"] += 1
        occupied = sum(1 for g in self._slot_req if g is not None)
        self._m["live_row_steps"] += occupied * self.dec.segment_len
        self._m["row_steps"] += self.dec.n_slots * self.dec.segment_len
        harvest = [s for s in range(self.dec.n_slots)
                   if done[s] and self._slot_req[s] is not None
                   and s not in stale_ok]
        if harvest:
            codes = self.dec.fetch_codes()
            ready = []
            for s in harvest:
                g = self._slot_req[s]
                self._slot_req[s] = None
                g.cands.append((codes[s], int(gen[s])))
                self._m["tokens"] += int(gen[s])
                free.append(s)
                if len(g.cands) == g.need:
                    if g.need == 1:
                        self._finished.append(
                            (g, g.cands[0][0], g.cands[0][1]))
                    else:
                        ready.append(g)
            if ready:
                self._rerank(ready)
        # render when a batch has accumulated, or promptly when no queued
        # traffic is waiting for the freed slots (low load -> prioritize
        # latency; high load -> batch renders)
        if self._finished and (len(self._finished) >= self.render_min
                               or self._q.empty()):
            self._render()
        return free
