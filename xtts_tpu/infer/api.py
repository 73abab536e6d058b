"""TextToSpeech — end-to-end zero-shot inference pipeline.

The TPU equivalent of the reference's live path (test.py:108-177 +
ttts/api.py TextToSpeech): per sentence

    text -> tokens -> GPT AR mel codes        (generate_speech, while_loop)
         -> [shortcut] DVAE decode -> Vocos   (test.py:152-154)
         -> GPT teacher-forced latents        (test.py:157-160)
         -> diffusion p_sample_loop w/ CFG    (do_spectrogram_diffusion)
         -> Vocos -> waveform                 (test.py:163-164)

TPU-first details:
* reference-mel CLIP context is computed once per utterance and reused for
  all 50 diffusion steps (the reference recomputes it every step);
* cond/uncond CFG shares one ReferenceNet pass per step, and the two
  BaseModel passes run as a single 2B-batched call;
* every stage is jitted with static shapes; text/code lengths are padded to
  buckets to bound recompilation.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import XTTSConfig
from xtts_tpu.diffusion.gaussian import GaussianDiffusion
from xtts_tpu.dsp.mel import MelFrontend
from xtts_tpu.models.aa_diffusion import (
    AADiffusion, denormalize_tacotron_mel, nearest_resize_time,
    normalize_tacotron_mel,
)
from xtts_tpu.models.dvae import DVAE
from xtts_tpu.models.gpt import UnifiedVoice
from xtts_tpu.models.gpt_infer import generate_speech
from xtts_tpu.models.vocos import Vocos


def bucket_len(n: int, buckets=(32, 64, 128, 256, 402)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def fix_autoregressive_output(codes: np.ndarray, stop_token: int,
                              complain: bool = True) -> np.ndarray:
    """Tortoise calm-token tail fix (ttts/api.py:82-109), host-side.

    The tortoise DVAE was trained on zero-padded audio, so raw AR codes
    (which end at the stop token with no padding) decode with a harsh
    "BLAH" tail; the fix overwrites everything from the first stop token
    with the DVAE's silence code (83) and pins the final three codes to
    the codes that zero-padded audio actually ends with (45, 45, 248).
    These constants are specific to the tortoise English DVAE — the live
    Mandarin path (test.py:150) instead strips the last 2 codes and pads
    with the GPT stop token, which is what tts()/tts_tokens() do. This
    helper exists for users porting tortoise-path (ttts/api.py) code.

    Quirk kept: the reference guards the tail write with
    `stm - 3 < codes.shape[0]`, which is always true — so the tail is
    always written whenever a stop token exists, even overwriting real
    codes when the stop arrives fewer than 3 positions from the end.
    Returns a copy; 1-D int codes in, same shape out.
    """
    codes = np.array(codes)
    (idx,) = np.nonzero(codes == stop_token)
    if idx.size == 0:
        if complain:
            print("No stop tokens found in one of the generated voice "
                  "clips. This typically means the spoken audio is too "
                  "long. In some cases, the output will still be good, "
                  "though. Listen to it and if it is missing words, try "
                  "breaking up your input text.")
        return codes
    stm = int(idx.min())
    codes[idx] = 83
    codes[stm:] = 83
    if stm - 3 < codes.shape[0]:  # reference quirk: always true
        codes[-3] = 45
        codes[-2] = 45
        codes[-1] = 248
    return codes


@dataclass
class TTSSettings:
    """test.py:113-118 knobs."""

    top_p: float = 0.8
    temperature: float = 0.8
    repetition_penalty: float = 2.0
    max_mel_tokens: int = 600
    diffusion_temperature: float = 1.0
    sampler: str = "p"              # live path: spaced-50 ancestral
    diffusion_steps: int = 50
    cond_free_k: float = 2.0
    # CLVP candidate reranking (ttts/api.py:397-460; tortoise presets
    # num_autoregressive_samples, api.py:276-281). 1 = off (test.py path).
    num_candidates: int = 1
    # pad text tokens up to a bucket length (with stop tokens) so the AR
    # program compiles once per bucket instead of once per sentence length
    pad_text_to_bucket: bool = True
    # Dispatch the render at the max_mel_tokens cap bucket WITHOUT waiting
    # for the generated length: the lengths fetch then overlaps render
    # execution instead of stalling before its dispatch, removing one
    # host-sync RTT (~20-30 ms on a tunneled chip — PERF.md) from the
    # utterance critical path. Exact when utterances run near the cap
    # (set max_mel_tokens per request from expected text length); for much
    # shorter utterances it wastes render compute on the larger bucket and
    # the attention over the longer stop-padded tail can perturb the kept
    # region slightly. Diffusion-path B=1 only; ignored elsewhere.
    speculative_render: bool = False
    # Segmented KV-cache capacity ladder, e.g. (64, 128, 256) — the decode
    # runs against progressively larger caches so early steps read a much
    # smaller K/V buffer (TPU-shaped "KV-cache paging", BASELINE config #5;
    # token-exact, see gpt_infer.generate_speech). Pays off when cache
    # reads dominate — large-B serving: the round-4 same-process pipeline
    # A/B measured 1.40x full-quality at B=16 K=2 (PERF.md pipe_b16), so
    # "auto" (the default) engages (128, 256) at >=16 AR rows and stays
    # monolithic below (B=1 e2e is unaffected — the fused B=1 engine
    # ignores the ladder). Explicit None/() = always monolithic; an
    # explicit tuple is used as given.
    cache_ladder: Union[str, tuple, None] = "auto"
    # int8 KV cache (quantized_decode engines only): per-(position, head)
    # symmetric int8 K/V with scales folded into the attention scores/probs
    # — halves the dominant serving-batch cache stream; near-lossless
    # (tests/test_qdecode.py). Composes with cache_ladder.
    kv_quant: bool = False
    # Sparse ReferenceNet hoist interval: k>1 precomputes ReferenceNet
    # features at every k-th spaced timestep and reuses the nearest cached
    # set per denoise step (~(k-1)/k of the ReferenceNet cost saved where
    # the full hoist loses on feature traffic — B>=16 serving). 1 = exact
    # reference semantics (aa_model.py:337 recomputes every step). Spaced
    # samplers only; beyond-reference approximation knob.
    refnet_interval: int = 1
    # Compacting decode waves (infer/compact.py): row-count buckets the
    # batched AR decode may shrink through at cache-ladder rung boundaries,
    # dropping finished rows so the done tail stops paying cache reads
    # (e.g. (1, 2, 4, 8, 16)). None = monolithic batch. B>1 serving only;
    # greedy stays token-exact, sampled draws can differ after a drop (the
    # categorical's shape includes B). Gates off the fused Pallas engines.
    compact_rows: Optional[tuple] = None

    @classmethod
    def preset(cls, name: str) -> "TTSSettings":
        """Tortoise-style quality presets (ttts/api.py:276-281). AR samples
        map to CLVP candidates (requires with_clvp=True for K>1)."""
        table = {
            "ultra_fast": dict(num_candidates=1, diffusion_steps=15,
                               sampler="dpm++2m"),
            "fast": dict(num_candidates=4, diffusion_steps=25,
                         sampler="dpm++2m"),
            "standard": dict(num_candidates=8, diffusion_steps=50),
            "high_quality": dict(num_candidates=8, diffusion_steps=100),
        }
        if name not in table:
            raise KeyError(f"unknown preset {name!r}; have {sorted(table)}")
        return cls(**table[name])


class TextToSpeech:
    """Holds models + variables; host-side orchestration, device-side math."""

    def __init__(self, cfg: XTTSConfig = XTTSConfig(), variables=None,
                 rng: Optional[jax.Array] = None, dtype=jnp.float32,
                 with_clvp: bool = False, quantized_decode: bool = False,
                 with_hifigan: bool = False, tokenizer=None):
        """quantized_decode: int8 weight-only AR decode engine — ~1.5x
        tokens/s on v5e, logits within per-channel-int8 error (~99% greedy
        token agreement); see xtts_tpu/infer/qdecode.py.

        with_hifigan: attach the XTTS-v2-style HifiDecoder so
        tts/tts_tokens can render GPT latents DIRECTLY to waveform,
        skipping diffusion+Vocos (the reference's alternative vocoder path,
        ttts/hifigan/hifigan_vocoder.py:655-771, README.md:46-47).

        tokenizer: a VoiceBpeTokenizer for tts()/tts_stream() text framing
        (the reference loads cfg.dataset.gpt_vocab, test.py:81); None uses
        the shipped default. from_pretrained picks up a tokenizer.json in
        the model dir automatically — a tokenizer trained by
        data.prepare.train_bpe_from_corpus plugs in here."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mel = MelFrontend(cfg.mel)
        self.gpt = UnifiedVoice(cfg.gpt, dtype=dtype)
        self.dvae = DVAE(cfg.vqvae, dtype=dtype)
        # flash=True: inference-only flash attention in the big consumer
        # self-attn — ±1% step time, 30-100x faster render-program compiles
        # (PERF.md round-5 phase 17); trainers keep einsum (the kernel's
        # backward at head_dim 64 costs ~27% step). XTTS_FLASH_ATTN=0 kills.
        self.diffusion = AADiffusion(cfg.diffusion, dtype=dtype, flash=True)
        self.vocos = Vocos(cfg.vocos, dtype=dtype)
        self.clvp = None
        if with_clvp:
            from xtts_tpu.models.clvp import CLVP
            self.clvp = CLVP(cfg.clvp, dtype=dtype)
        self.hifigan = None
        self._spk_mel_frontend = None
        if with_hifigan:
            from xtts_tpu.models.hifigan import HifiDecoder
            self.hifigan = HifiDecoder(cfg.hifigan, dtype=dtype)
        self.vars = variables if variables is not None else {}
        if not self.vars:
            self.init_random(rng if rng is not None else jax.random.PRNGKey(0))
        self.quantized_decode = quantized_decode
        self.last_oov = {}          # {hanzi: drops} from the latest request
        self.mesh = None            # set by place_on_mesh
        self._qtree = None
        if quantized_decode:
            from xtts_tpu.infer.qdecode import quantize_gpt_decode
            # the fused-kernel tile stack (a second ~190 MB weight copy) is
            # attached lazily on first B=1 fused use
            self._qtree = quantize_gpt_decode(self.vars["gpt"], cfg.gpt,
                                              include_fused=False)

    def _generate(self, cond, text, key, settings: "TTSSettings"):
        """AR generation via the active decode engine."""
        if settings.cache_ladder == "auto":
            # serving default (round-4 pipe_b16 A/B: 1.40x at 32 AR rows,
            # token-exact); monolithic below 16 rows where rung-transition
            # overhead eats the smaller cache savings
            ladder = (128, 256) if text.shape[0] >= 16 else None
        else:
            ladder = (tuple(settings.cache_ladder) if settings.cache_ladder
                      else None)  # lists would break jit's static-arg hashing
        kw = dict(max_gen=settings.max_mel_tokens, top_p=settings.top_p,
                  temperature=settings.temperature,
                  repetition_penalty=settings.repetition_penalty,
                  cache_ladder=ladder)
        if (settings.compact_rows and text.shape[0] > 1
                and getattr(self, "mesh", None) is None):
            # compacting decode waves (infer/compact.py): segment the decode
            # at the ladder rungs and shrink the batch as rows finish; takes
            # precedence over the fused Pallas engines (fixed-B programs)
            from xtts_tpu.infer.compact import generate_speech_compacting
            return generate_speech_compacting(
                self.gpt, self.vars["gpt"], self._qtree, cond, text, key,
                quantize_kv_cache=settings.kv_quant,
                row_buckets=tuple(settings.compact_rows), **kw)
        if self._qtree is not None:
            from xtts_tpu.infer.qdecode import generate_speech_quantized
            # B=1 on TPU runs each token as one fused pallas_call
            # (ops/decode_step.py, 1.11-1.16x over the XLA step chain);
            # override with XTTS_FUSED_DECODE=0/1
            ov = os.environ.get("XTTS_FUSED_DECODE")
            fused = (ov == "1" if ov is not None
                     else (cond.shape[0] == 1
                           and jax.default_backend() == "tpu"
                           and not settings.kv_quant))
            # experimental fused batched serving step (ops/serving_step.py):
            # whole B-row step in one pallas_call over an int8 row-quantized
            # KV cache; opt-in via XTTS_FUSED_SERVING=1 until the on-chip
            # A/B (scripts/ab_fused_serving.py) proves it in-program
            fserv = (os.environ.get("XTTS_FUSED_SERVING") == "1"
                     and not fused and cond.shape[0] in (8, 16)
                     and not settings.kv_quant)
            if (fused or fserv) and "fused" not in self._qtree:
                from xtts_tpu.infer.qdecode import attach_fused_stack
                attach_fused_stack(self._qtree, self.cfg.gpt)
            return generate_speech_quantized(
                self.gpt, self.vars["gpt"], self._qtree, cond, text, key,
                use_fused=fused, use_fused_serving=fserv,
                quantize_kv_cache=settings.kv_quant, **kw)
        if settings.kv_quant:
            raise ValueError("TTSSettings.kv_quant needs "
                             "TextToSpeech(quantized_decode=True)")
        return generate_speech(self.gpt, self.vars["gpt"], cond, text, key,
                               **kw)

    @classmethod
    def from_pretrained(cls, model_dir: str, cfg: Optional[XTTSConfig] = None,
                        dtype=jnp.float32, **kw) -> "TextToSpeech":
        """Load per-model weights from a directory (the reference's
        test.py:32-86 loads gpt/dvae/diffusion/vocos checkpoints separately).

        Looks for <name>.npz (native) or <name>.pth/.pt (torch, converted via
        xtts_tpu.utils.convert) for each of gpt/vqvae/diffusion/vocos
        (+clvp when with_clvp); missing files fall back to random init with
        a warning. An xtts_config.json in the dir overrides `cfg`.
        """
        import glob as _glob
        import logging
        log = logging.getLogger(__name__)
        cfg_path = os.path.join(model_dir, "xtts_config.json")
        if cfg is None:
            cfg = (XTTSConfig.from_json(cfg_path)
                   if os.path.exists(cfg_path) else XTTSConfig())
        tok_path = os.path.join(model_dir, "tokenizer.json")
        if "tokenizer" not in kw and os.path.exists(tok_path):
            from xtts_tpu.text.tokenizer import VoiceBpeTokenizer
            kw["tokenizer"] = VoiceBpeTokenizer(tok_path)
        tts = cls(cfg, dtype=dtype, **kw)
        from xtts_tpu.utils.registry import load_model
        names = ["gpt", "vqvae", "diffusion", "vocos"]
        if tts.clvp is not None:
            names.append("clvp")
        if tts.hifigan is not None:
            names.append("hifigan")
        alias = {"vqvae": "dvae"}
        for name in names:
            hits = []
            for stem in (name, alias.get(name, name)):
                for ext in (".npz", ".pth", ".pt", ".bin"):
                    hits += _glob.glob(os.path.join(model_dir, stem + ext))
            if not hits:
                log.warning("from_pretrained: no weights for %r in %s "
                            "(random init kept)", name, model_dir)
                continue
            _, variables = load_model(name, cfg, weights_path=hits[0],
                                      dtype=dtype)
            key = "dvae" if name == "vqvae" else name
            tts.vars[key] = variables
        if tts.quantized_decode:
            from xtts_tpu.infer.qdecode import quantize_gpt_decode
            tts._qtree = quantize_gpt_decode(tts.vars["gpt"], cfg.gpt,
                                             include_fused=False)
        return tts

    def init_random(self, key):
        """Random-weight init (shapes per the shipped configs).

        Each init is jitted: eager flax init dispatches hundreds of tiny ops
        (5 min over a remote-TPU tunnel); one compiled program takes seconds.
        """
        kg, kd, kf, kv = jax.random.split(key, 4)
        c = self.cfg
        self.vars["gpt"] = jax.jit(self.gpt.init)(
            kg, jnp.zeros((1, c.gpt.mel_bins, 64)), jnp.zeros((1, 8), jnp.int32),
            jnp.array([8]), jnp.zeros((1, 16), jnp.int32), jnp.array([16 * 1024]))
        self.vars["dvae"] = jax.jit(self.dvae.init)(
            kd, jnp.zeros((1, c.vqvae.channels, 64)))
        self.vars["diffusion"] = jax.jit(self.diffusion.init)(
            kf, jnp.zeros((1, c.diffusion.in_channels, 16)), jnp.array([0]),
            jnp.zeros((1, c.diffusion.in_latent_channels, 4)),
            jnp.zeros((1, c.diffusion.in_channels, 16)))
        self.vars["vocos"] = jax.jit(self.vocos.init)(
            kv, jnp.zeros((1, c.vocos.input_channels, 16)))
        if self.clvp is not None:
            kc = jax.random.fold_in(key, 5)
            self.vars["clvp"] = jax.jit(self.clvp.init)(
                kc, jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32))
        if self.hifigan is not None:
            kh = jax.random.fold_in(key, 6)
            # init through the ref_mel16k path so BOTH the waveform decoder
            # and the speaker encoder get parameters (models/hifigan.py note)
            self.vars["hifigan"] = jax.jit(
                lambda k, lat, m16: self.hifigan.init(k, lat, ref_mel16k=m16))(
                    kh, jnp.zeros((1, 8, c.hifigan.decoder_input_dim)),
                    jnp.zeros((1, 16, 64)))

    # ------------------------------------------------------------------

    def cond_mel_from_wav(self, wav: np.ndarray) -> jnp.ndarray:
        """Reference audio (T,) or (1, T) float -> conditioning mel."""
        return self.mel(wav)

    def cond_mel_bucketed(self, wav: np.ndarray,
                          bucket_seconds=(3.0, 6.0, 10.0)) -> jnp.ndarray:
        """Reference clip -> conditioning mel at a shared length bucket:
        the clip is zero-padded up to the next bucket (or head-cropped to
        the last one), so per-request voices in one serving batch stack on
        a common T (SynthesisRequest.cond_mel). The reference pads/crops
        cond clips to one fixed length the same way (ttts/api.py:68-79
        format_conditioning)."""
        sr = self.cfg.mel.sample_rate
        w = np.asarray(wav, np.float32).reshape(-1)
        for s in bucket_seconds:
            n = int(s * sr)
            if len(w) <= n:
                return self.mel(np.pad(w, (0, n - len(w))))
        return self.mel(w[:int(bucket_seconds[-1] * sr)])

    def cond_mels_from_wavs(self, wavs) -> jnp.ndarray:
        """Multiple reference clips -> stacked conditioning mels
        (1, n_clips, mel, T).

        The reference's multi-sample path (ttts/api.py:225-240) runs
        format_conditioning (api.py:68-79) per clip — zero-pad or crop each
        to one fixed length so the mels stack on dim 1 — then averages the
        per-clip encoder outputs inside get_conditioning. We pad every clip
        to the longest one (head-aligned; the reference random-crops long
        clips, which we skip for determinism)."""
        arrs = [np.asarray(w, np.float32).reshape(-1) for w in wavs]
        n = max(a.shape[0] for a in arrs)
        mels = [self.mel(np.pad(a, (0, n - a.shape[0]))) for a in arrs]
        return jnp.stack(mels, axis=1)          # (1, n_clips, mel, T)

    def place_on_mesh(self, mesh) -> None:
        """Replicate all model variables (and the int8 qtree) over a
        `jax.sharding.Mesh` with a 'data' axis, enabling multi-chip
        data-sharded serving: synthesize_batch then shards the request
        rows over the mesh and GSPMD partitions the AR while_loop + render
        programs (sharded == replicated token-for-token,
        tests/test_sampling_sharded.py). Call once after weights load."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if "data" not in mesh.axis_names:
            raise ValueError(
                f"place_on_mesh needs a 'data' axis; got {mesh.axis_names}")
        rep = NamedSharding(mesh, P())
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t)
        self.vars = {k: put(v) for k, v in self.vars.items()}
        if self._qtree is not None:
            fused = self._qtree.pop("fused", None)
            self._qtree = put(self._qtree)
            if fused is not None:
                # the fused stack is the B=1 single-chip kernel; keep it
                # off-mesh (serving batches never use it)
                self._qtree["fused"] = fused
        self.mesh = mesh

    def speaker_mel_from_wav(self, wav: np.ndarray,
                             bucket_seconds=(3.0, 6.0, 10.0)) -> jnp.ndarray:
        """Reference clip at cfg.mel.sample_rate -> (1, T, 64) 16 kHz
        log-mel for the HiFi-GAN speaker encoder (the reference resamples
        24k->16k before its torch-spec mel, ttts/hifigan/train_ms.py:110-117
        + hifigan_vocoder.py:671-678). The clip is zero-padded to a length
        bucket (cropped past the last) so T snaps to a small ladder —
        device-facing lengths must be bucketed to bound compile counts
        (CLAUDE.md), and per-request speaker mels in one serving batch
        must share T."""
        from xtts_tpu.data.audio import resample
        from xtts_tpu.dsp.mel import SPEAKER_ENCODER_MEL_CONFIG
        if self._spk_mel_frontend is None:
            self._spk_mel_frontend = MelFrontend(SPEAKER_ENCODER_MEL_CONFIG)
        w = np.asarray(wav, np.float32).reshape(-1)
        sr16 = SPEAKER_ENCODER_MEL_CONFIG.sample_rate
        w16 = resample(w, self.cfg.mel.sample_rate, sr16)
        for s in bucket_seconds:
            n = int(s * sr16)
            if len(w16) <= n:
                w16 = np.pad(w16, (0, n - len(w16)))
                break
        else:
            w16 = w16[:int(bucket_seconds[-1] * sr16)]
        return jnp.swapaxes(self._spk_mel_frontend(w16), 1, 2)

    # jitted model entry points (eager flax apply dispatches per-op — ~100x
    # slower over a remote-TPU tunnel; one compiled program per shape bucket)

    @functools.cached_property
    def _latent_jit(self):
        return jax.jit(functools.partial(self.gpt.apply, return_latent=True))

    @functools.cached_property
    def _vocos_jit(self):
        return jax.jit(self.vocos.apply)

    @functools.cached_property
    def _dvae_decode_jit(self):
        return jax.jit(functools.partial(self.dvae.apply,
                                         method=self.dvae.decode))

    @functools.cached_property
    def _render_hifigan_jit(self):
        """codes -> teacher-forced GPT latents -> HifiDecoder waveform (one
        program; the reference's latent->hifigan alternative to
        latent->diffusion->vocos, hifigan_vocoder.py:744-756)."""
        def impl(gvars, hvars, cond_mel, text_tokens, text_lens, codes,
                 wav_lens, spk_mel16):
            latent = self.gpt.apply(gvars, cond_mel, text_tokens, text_lens,
                                    codes, wav_lens, return_latent=True)
            return self.hifigan.apply(hvars, latent, ref_mel16k=spk_mel16)
        return jax.jit(impl)

    @functools.cached_property
    def _clvp_rerank_jit(self):
        return jax.jit(functools.partial(self.clvp.apply,
                                         method=self.clvp.rerank))

    @functools.cached_property
    def _clvp_rerank_batch_jit(self):
        return jax.jit(functools.partial(self.clvp.apply,
                                         method=self.clvp.rerank_batch))

    def _diffuser(self, settings: TTSSettings) -> GaussianDiffusion:
        return GaussianDiffusion.spaced(
            self.cfg.diffusion_process.timesteps, settings.diffusion_steps,
            schedule=self.cfg.diffusion_process.schedule,
            conditioning_free=True, conditioning_free_k=settings.cond_free_k,
            ramp_conditioning_free=True)

    def _diffusion_mel(self, latent, cond_mel_norm, key, steps=50,
                       sampler="p", cond_free_k=2.0, temperature=1.0,
                       refnet_interval=1):
        if not hasattr(self, "_diff_jit"):
            self._diff_jit = jax.jit(
                self._diffusion_mel_impl,
                static_argnames=("steps", "sampler", "cond_free_k",
                                 "refnet_interval"))
        return self._diff_jit(self.vars["diffusion"], latent, cond_mel_norm,
                              key, temperature, steps=steps, sampler=sampler,
                              cond_free_k=cond_free_k,
                              refnet_interval=refnet_interval)

    @functools.cached_property
    def _render_full_jit(self):
        """ONE program for latent-extract -> diffusion -> vocos.

        The tunnel charges ~20-25 ms fixed per program launch (PERF.md), so
        running these three stages as separate jits costs two extra
        round-trips per utterance; fused they are a single dispatch.
        Compiles once per (code-bucket, steps, sampler) combination."""
        def impl(gvars, dvars, vvars, cond_mel, diff_cond_norm, text_tokens,
                 text_lens, codes, wav_lens, key, temperature,
                 steps, sampler, cond_free_k, refnet_interval=1):
            latent = self.gpt.apply(gvars, cond_mel, text_tokens, text_lens,
                                    codes, wav_lens, return_latent=True)
            latent = jnp.swapaxes(latent, 1, 2)        # (B, D, N)
            mel = self._diffusion_mel_impl(
                dvars, latent, diff_cond_norm, key, temperature,
                steps=steps, sampler=sampler, cond_free_k=cond_free_k,
                refnet_interval=refnet_interval)
            return self.vocos.apply(vvars, mel)
        return jax.jit(impl,
                       static_argnames=("steps", "sampler", "cond_free_k",
                                        "refnet_interval"))

    @functools.cached_property
    def _render_shortcut_jit(self):
        """ONE program for dvae-decode -> vocos (test.py:152-154 shortcut)."""
        def impl(dvvars, vvars, codes):
            mel_rec, _ = self.dvae.apply(dvvars, codes,
                                         method=self.dvae.decode)
            return self.vocos.apply(vvars, mel_rec), mel_rec
        return jax.jit(impl)

    @functools.cached_property
    def _pad_codes_jit(self):
        """Device-side bucket padding of generated codes: rows keep their
        first `ns[i]` codes, the rest fill with the stop token (the same
        preformat training applies per wav_lengths). Doing this on device
        needs only the LENGTHS on host (a tiny fetch) — the full code matrix
        transfer then overlaps with the render program instead of stalling
        before it (each host sync pays the ~20 ms tunnel RTT, PERF.md)."""
        def impl(codes, ns, n_b):
            b, l = codes.shape
            stop = self.cfg.gpt.stop_mel_token
            if l >= n_b:
                sliced = codes[:, :n_b]
            else:
                sliced = jnp.pad(codes, ((0, 0), (0, n_b - l)),
                                 constant_values=stop)
            pos = jnp.arange(n_b)[None, :]
            return jnp.where(pos < ns[:, None], sliced, stop)
        return jax.jit(impl, static_argnames=("n_b",))

    def _diffusion_mel_impl(self, dvars, latent, cond_mel_norm, key,
                            temperature, steps=50, sampler="p",
                            cond_free_k=2.0, refnet_interval=1):
        """do_spectrogram_diffusion (ttts/diffusion/train.py:36-51), with the
        CLIP context hoisted and CFG batched.

        refnet_interval k>1: SPARSE ReferenceNet hoist — features are
        precomputed at every k-th spaced timestep and each denoise step
        reuses the nearest cached set (floor). ReferenceNet features vary
        smoothly in t (only the timestep embedding differs; the refer mel
        is fixed), so small k trades a bounded approximation for ~(k-1)/k
        of the ReferenceNet cost in regimes where the FULL hoist loses on
        feature-memory traffic (B=16 serving: 800 upfront instances lost
        to per-step recompute — PERF.md round 3). k=1 is exact reference
        semantics. Beyond-reference knob; default off."""
        gd = GaussianDiffusion.spaced(
            1000, steps, conditioning_free=True,
            conditioning_free_k=cond_free_k, ramp_conditioning_free=True)
        b, _, t_lat = latent.shape
        out_len = t_lat * 4
        shape = (b, self.cfg.diffusion.in_channels, out_len)

        ctx = self.diffusion.apply(dvars, cond_mel_norm,
                                   method=self.diffusion.encode_reference)
        hint = jnp.swapaxes(
            nearest_resize_time(jnp.swapaxes(latent, 1, 2), out_len), 1, 2)
        uncond_hint = self.diffusion.apply(
            dvars, b, out_len, method=self.diffusion.uncond_hint)

        # Hoist the ReferenceNet out of the sampling loop: its features
        # depend on t only through the timestep embedding and the spaced
        # samplers visit a STATIC timestep list, so all `steps` passes batch
        # into one upfront call (the reference recomputes it every step,
        # aa_model.py:337; SURVEY §7 hard parts). Gated by total feature
        # memory (~4 MB/step/seq: b*steps <= 512 keeps it under ~2 GB at
        # flagship shapes — covers both B=1 e2e and B=8 batched serving)
        # and to samplers on the spaced grid (the continuous-time solvers
        # query arbitrary float t).
        ov = os.environ.get("XTTS_HOIST_REF")
        spaced = sampler in ("p", "ddim", "dpm++2m", "unipc")
        k_int = max(1, int(refnet_interval)) if spaced else 1
        n_cached = -(-steps // k_int)        # ceil: cached timestep count
        # the continuous-time solvers query arbitrary float t — hoisting is
        # never valid there, so the env override only flips the gate within
        # the spaced family. The memory gate scales with the CACHED count,
        # so refnet_interval>1 re-enables hoisting at serving batch sizes.
        hoist = spaced and ((b * n_cached <= 512) if ov is None
                            else ov == "1")
        tmap = jnp.asarray(gd.timestep_map)
        control_all = None
        if hoist:
            sub = jnp.asarray(np.arange(0, gd.num_timesteps, k_int))
            nc = sub.shape[0]
            t_all = jnp.repeat(tmap[sub], b)                 # (nc*B,)
            ref_all = jnp.tile(cond_mel_norm, (nc, 1, 1))
            ctx_all = jnp.tile(ctx, (nc, 1, 1))
            ca = self.diffusion.apply(
                dvars, ref_all, t_all, ctx_all,
                method=self.diffusion.reference_features)
            control_all = [c.reshape(nc, b, *c.shape[1:]) for c in ca]

        def model_fn(x, t_orig):
            """Paired CFG call: one ReferenceNet pass, one 2B BaseModel pass."""
            if control_all is not None:
                si = jnp.searchsorted(tmap, t_orig[0])
                control = [c[si // k_int] for c in control_all]
            else:
                control = self.diffusion.apply(
                    dvars, cond_mel_norm, t_orig, ctx,
                    method=self.diffusion.reference_features)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t_orig, t_orig], axis=0)
            h2 = jnp.concatenate([hint, uncond_hint], axis=0)
            ctx2 = jnp.concatenate([ctx, ctx], axis=0)
            ctrl2 = [jnp.concatenate([ci, ci], axis=0) for ci in control]
            out = self.diffusion.apply(dvars, x2, t2, h2, ctx2, ctrl2,
                                       method=self.diffusion.denoise)
            return out[:b], out[b:]

        if key.ndim == 2:
            # per-row keys (B, 2): each row's initial noise + ancestral
            # chain is a pure function of its own key, independent of the
            # batch it rides in (continuous-batching determinism,
            # infer/slots.py; p_sample_loop handles the in-loop draws)
            splits = jax.vmap(jax.random.split)(key)
            key, nk = splits[:, 0], splits[:, 1]
            noise = jax.vmap(
                lambda k: jax.random.normal(k, shape[1:]))(nk) * temperature
        else:
            key, nk = jax.random.split(key)
            noise = jax.random.normal(nk, shape) * temperature
        mel = gd.sample_loop(model_fn, shape, key, noise=noise, sampler=sampler)
        return denormalize_tacotron_mel(mel)[:, :, :out_len]

    # ------------------------------------------------------------------

    def tts_tokens(self, text_tokens: np.ndarray, cond_mel: jnp.ndarray,
                   key=None, settings: TTSSettings = TTSSettings(),
                   use_diffusion: bool = True,
                   return_intermediates: bool = False,
                   use_hifigan: bool = False,
                   spk_mel16: Optional[jnp.ndarray] = None):
        """Synthesize from prepared text tokens (B=1). Returns dict with
        'wav' (np.ndarray) and 'codes'; with return_intermediates also
        'latent'/'mel' (several MB of device->host traffic per call — keep
        off in serving paths).

        use_hifigan: render GPT latents directly to waveform through the
        HifiDecoder (skipping diffusion+Vocos) — requires
        with_hifigan=True and spk_mel16 (speaker_mel_from_wav of the
        reference clip). The reference's alternative vocoder path
        (hifigan_vocoder.py:744-756)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        text_tokens = jnp.asarray(text_tokens, jnp.int32)
        if text_tokens.ndim == 1:
            text_tokens = text_tokens[None]

        k_cand = settings.num_candidates
        if k_cand > 1:
            # CLVP reranking: K candidates in one batched AR program, best
            # row by contrastive score (ttts/api.py:397-460 semantics)
            if self.clvp is None or "clvp" not in self.vars:
                raise ValueError(
                    "num_candidates > 1 needs TextToSpeech(with_clvp=True)")
            text_k = jnp.tile(text_tokens, (k_cand, 1))
            cond_k = jnp.tile(cond_mel, (k_cand,) + (1,) * (cond_mel.ndim - 1))
            res = self._generate(cond_k, text_k, k1, settings)
            code_mask = (jnp.arange(res.codes.shape[1])[None]
                         < res.lengths[:, None]).astype(jnp.int32)
            scores = self._clvp_rerank_jit(
                self.vars["clvp"], text_tokens[0],
                jnp.clip(res.codes, 0, self.cfg.clvp.num_speech_tokens - 1),
                code_mask)
            best = int(jnp.argmax(scores))
            from xtts_tpu.models.gpt_infer import GenerateResult
            res = GenerateResult(res.codes[best:best + 1],
                                 res.lengths[best:best + 1], res.steps)
        else:
            res = self._generate(cond_mel, text_tokens, k1, settings)

        spec = (settings.speculative_render and use_diffusion
                and not return_intermediates and not use_hifigan)
        # pad codes (with stop tokens, as training does per wav_lengths) up to
        # a bucket so latent/diffusion/vocos programs compile once per bucket,
        # not once per utterance length; outputs are trimmed to the true n.
        # The padding runs ON DEVICE so the full code matrix never has to
        # reach the host before the render dispatch.
        if spec:
            # Speculative: bucket by the CAP, not the generated length — no
            # host sync between the AR program and the render dispatch; the
            # true lengths are fetched in finish(), where the transfer
            # overlaps render execution.
            n_b = bucket_len(max(settings.max_mel_tokens - 2, 1),
                             self._code_buckets())
            lengths_host = None
        else:
            lengths_host = np.asarray(res.lengths)       # tiny sync
            n = max(int(lengths_host[0]) - 2, 1)
            n_b = bucket_len(n, self._code_buckets())
        lens_dev = jnp.clip(res.lengths - 2, 1, n_b)  # strip 2 (test.py:150)
        codes = self._pad_codes_jit(res.codes, lens_dev, n_b=n_b)
        hop = self.cfg.vocos.hop_length   # wav samples per mel frame
        comp = self.cfg.vqvae.compression

        def finish(out, wav, trim=None):
            # fetch the raw codes/lengths AFTER the render dispatch — the
            # transfers overlap render execution instead of stalling it
            lh = (np.asarray(res.lengths) if lengths_host is None
                  else lengths_host)
            n = max(int(lh[0]) - 2, 1)
            out["codes"] = np.asarray(res.codes)
            out["lengths"] = lh
            out["wav"] = np.asarray(
                wav[:, :(trim(n) if trim is not None else n * comp * hop)])
            return out

        if use_hifigan:
            if self.hifigan is None or "hifigan" not in self.vars:
                raise ValueError(
                    "use_hifigan needs TextToSpeech(with_hifigan=True)")
            if spk_mel16 is None:
                raise ValueError("use_hifigan needs spk_mel16 "
                                 "(speaker_mel_from_wav of the ref clip)")
            wav = self._render_hifigan_jit(
                self.vars["gpt"], self.vars["hifigan"], cond_mel,
                text_tokens, jnp.array([text_tokens.shape[-1]]), codes,
                lens_dev * self.cfg.gpt.mel_length_compression, spk_mel16)
            # samples per latent differ from the vocos path
            # (models/hifigan.py length contract)
            from xtts_tpu.models.hifigan import hifigan_samples
            return finish({}, wav,
                          trim=lambda n: hifigan_samples(self.cfg.hifigan, n))

        if not use_diffusion:
            wav, mel_rec = self._render_shortcut_jit(self.vars["dvae"],
                                                     self.vars["vocos"], codes)
            out = {}
            if return_intermediates:
                out["mel"] = np.asarray(mel_rec[:, :, :n * comp])
            return finish(out, wav)

        # with stacked multi-clip conditioning, the diffusion ReferenceNet /
        # CLIP refer mel is the first clip (the AA path has no multi-clip
        # support in the reference; only GPT conditioning averages)
        diff_cond = cond_mel if cond_mel.ndim == 3 else cond_mel[:, 0]
        if return_intermediates:
            # debug path: separate programs so latent/mel can be fetched
            latent = self._latent_jit(
                self.vars["gpt"], cond_mel, text_tokens,
                jnp.array([text_tokens.shape[-1]]), codes,
                lens_dev * self.cfg.gpt.mel_length_compression)
            latent = jnp.swapaxes(latent, 1, 2)      # (B, D, N) test.py:160
            mel = self._diffusion_mel(
                latent, normalize_tacotron_mel(diff_cond), k2,
                steps=settings.diffusion_steps, sampler=settings.sampler,
                cond_free_k=settings.cond_free_k,
                temperature=settings.diffusion_temperature,
                refnet_interval=settings.refnet_interval)
            wav = self._vocos_jit(self.vars["vocos"], mel)
            out = {"latent": np.asarray(latent[:, :, :n]),
                   "mel": np.asarray(mel[:, :, :n * comp])}
            return finish(out, wav)

        wav = self._render_full_jit(
            self.vars["gpt"], self.vars["diffusion"], self.vars["vocos"],
            cond_mel, normalize_tacotron_mel(diff_cond), text_tokens,
            jnp.array([text_tokens.shape[-1]]), codes,
            lens_dev * self.cfg.gpt.mel_length_compression, k2,
            settings.diffusion_temperature,
            steps=settings.diffusion_steps, sampler=settings.sampler,
            cond_free_k=settings.cond_free_k,
            refnet_interval=settings.refnet_interval)
        return finish({}, wav)

    def _code_buckets(self):
        # diffusion cost scales linearly with the bucketed code length
        # (out_len = 4*n_b), so a finer ladder near the common utterance
        # lengths buys real latency: n=298 on a 320 bucket renders 1280 mel
        # frames instead of 384's 1536 (-17% loop cost). Compile count per
        # extra bucket is bounded and the XLA cache persists across runs.
        m = self.cfg.gpt.max_mel_tokens
        ladder = [64, 128, 192, 256, 320, 384, 448, 512]
        return tuple([b for b in ladder if b < m] + [m])

    def _spk_mel16_from_cond(self, cond_wav) -> jnp.ndarray:
        first = (cond_wav[0] if isinstance(cond_wav, (list, tuple))
                 else cond_wav)
        return self.speaker_mel_from_wav(first)

    def _cond_mel_from_cond(self, cond_wav) -> jnp.ndarray:
        if isinstance(cond_wav, (list, tuple)):
            return (self.cond_mels_from_wavs(cond_wav) if len(cond_wav) > 1
                    else self.cond_mel_from_wav(cond_wav[0]))
        return self.cond_mel_from_wav(cond_wav)

    def _text_to_token_lists(self, text: str, lang: str,
                             settings: TTSSettings):
        from xtts_tpu.text.chinese import oov_stats
        from xtts_tpu.text.frontend import (sentence_to_tokens,
                                            split_sentences)
        token_lists = []
        import logging
        oov_before = oov_stats()
        for sent in split_sentences(text):
            tokens = sentence_to_tokens(
                sent, lang, tokenizer=self.tokenizer,
                start_token=self.cfg.gpt.start_text_token,
                stop_token=self.cfg.gpt.stop_text_token)
            cap = self.cfg.gpt.max_text_tokens
            if len(tokens) > cap:
                # one un-splittable sentence past the position-table
                # capacity: truncate rather than poison the whole request
                # (the reference's dataset rejects such samples outright,
                # ttts/gpt/dataset.py:72-74; at inference torch would crash
                # on the OOB embedding, jit would silently NaN)
                logging.getLogger(__name__).warning(
                    "sentence of %d tokens exceeds max_text_tokens=%d; "
                    "truncating", len(tokens), cap)
                tokens = np.concatenate(
                    [tokens[:cap - 1],
                     np.array([self.cfg.gpt.stop_text_token], np.int32)])
            if settings.pad_text_to_bucket:
                tb = bucket_len(len(tokens),
                                (16, 32, 64, 128, 256,
                                 self.cfg.gpt.max_text_tokens))
                tokens = np.pad(tokens, (0, max(0, tb - len(tokens))),
                                constant_values=self.cfg.gpt.stop_text_token)
            token_lists.append(tokens)
        # Per-call OOV accounting (VERDICT r3): hanzi the lexicon G2P could
        # not voice are dropped inside g2w (chinese.py) — surface the drop
        # count per request instead of letting it stay a buried debug log.
        # The reference's pypinyin backend never drops (chinese.py:105-108);
        # ours can, on chars outside the built-in lexicon.
        oov_after = oov_stats()
        self.last_oov = {c: n - oov_before.get(c, 0)
                         for c, n in oov_after.items()
                         if n > oov_before.get(c, 0)}
        if self.last_oov:
            logging.getLogger(__name__).warning(
                "g2p dropped %d hanzi with no reading this request: %s",
                sum(self.last_oov.values()),
                "".join(sorted(self.last_oov)))
        return token_lists

    def tts_stream(self, text: str, cond_wav: np.ndarray, key=None,
                   settings: TTSSettings = TTSSettings(), lang: str = "ZH",
                   use_diffusion: bool = True,
                   use_hifigan: bool = False):
        """Generator: yield each sentence's 24 kHz waveform as soon as it is
        rendered. Time-to-first-audio becomes one sentence's latency instead
        of the whole text's (the reference has no streaming mode —
        test.py:108-177 renders everything before writing gen.wav).
        Per-sentence outputs are bitwise identical to
        tts(batch_sentences=False) with the same key (same split sequence),
        so np.concatenate(list(tts_stream(...))) == that path's waveform."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cond_mel = self._cond_mel_from_cond(cond_wav)
        spk_mel16 = (self._spk_mel16_from_cond(cond_wav) if use_hifigan
                     else None)
        for tokens in self._text_to_token_lists(text, lang, settings):
            key, sub = jax.random.split(key)
            out = self.tts_tokens(tokens, cond_mel, sub, settings,
                                  use_diffusion=use_diffusion,
                                  use_hifigan=use_hifigan,
                                  spk_mel16=spk_mel16)
            yield out["wav"][0]

    def tts(self, text: str, cond_wav: np.ndarray, key=None,
            settings: TTSSettings = TTSSettings(), lang: str = "ZH",
            use_diffusion: bool = True,
            batch_sentences: bool = True,
            inter_sentence_silence_ms: float = 0.0,
            aligner=None,
            use_hifigan: bool = False) -> np.ndarray:
        """Full text in, 24 kHz waveform out — sentence-split like
        test.py:108-177.

        batch_sentences: run all sentences as ONE batched AR program
        (xtts_tpu/infer/serving.py) instead of the reference's sequential
        loop — for multi-sentence text this amortizes the weight-streaming
        cost per token (PERF.md batch-scaling table). CLVP reranking
        (num_candidates > 1) batches too: B sentences x K candidates in one
        AR program, per-sentence winners by contrastive score.

        aligner: an xtts_tpu.utils.alignment.Wav2VecAlignment — when given
        and `text` contains [bracketed] spans, the bracketed speech is
        synthesized and then EXCISED from the waveform by CTC forced
        alignment (the tortoise redaction path, ttts/api.py:180-181,536-540;
        the aligner's tokenizer must cover the text's script).

        cond_wav: one reference clip (array) or a list of clips — a list
        averages the GPT conditioning latents across clips like the
        reference's get_conditioning_latents (ttts/api.py:225-240 +
        ttts/gpt/model.py:463-476); the diffusion refer mel is the first
        clip (the reference AA path is single-clip only).

        use_hifigan: render through the HifiDecoder latent->wav path
        (with_hifigan=True required); multi-sentence text batches like the
        other renderers.
        """
        redact_text = None
        if aligner is not None and "[" in text:
            redact_text = text
            text = text.replace("[", "").replace("]", "")
        cond_mel = self._cond_mel_from_cond(cond_wav)
        key = key if key is not None else jax.random.PRNGKey(0)
        token_lists = self._text_to_token_lists(text, lang, settings)
        if not token_lists:
            return np.zeros(0, np.float32)

        gap = np.zeros(int(inter_sentence_silence_ms / 1000.0
                           * self.cfg.mel.sample_rate), np.float32)

        def join(wavs):
            out = []
            for i, w in enumerate(wavs):
                if i:
                    out.append(gap)
                out.append(w)
            return np.concatenate(out) if out else np.zeros(0, np.float32)

        def finish(wav: np.ndarray) -> np.ndarray:
            if redact_text is not None:
                return np.asarray(aligner.redact(wav, redact_text))
            return wav

        spk_mel16 = (self._spk_mel16_from_cond(cond_wav) if use_hifigan
                     else None)

        if batch_sentences and len(token_lists) > 1:
            from xtts_tpu.infer.serving import (SynthesisRequest,
                                                synthesize_batch)
            wavs = synthesize_batch(
                self, [SynthesisRequest(t) for t in token_lists], cond_mel,
                settings, use_diffusion=use_diffusion, key=key,
                use_hifigan=use_hifigan, spk_mel16=spk_mel16)
            return finish(join(wavs))
        wavs = []
        for tokens in token_lists:
            key, sub = jax.random.split(key)
            out = self.tts_tokens(tokens, cond_mel, sub, settings,
                                  use_diffusion=use_diffusion,
                                  use_hifigan=use_hifigan,
                                  spk_mel16=spk_mel16)
            wavs.append(out["wav"][0])
        return finish(join(wavs))
