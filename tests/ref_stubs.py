"""Make the read-only reference repo importable for golden parity tests.

The image lacks torchaudio/torchvision/librosa/k_diffusion/encodec/
rotary_embedding_torch, which the reference imports at module top level even
on code paths we never run (SURVEY.md §0 dep list). This installs minimal
sys.modules stubs so `import ttts.*` succeeds, then puts /root/reference on
sys.path.

Two stubs are *functional*, because parity tests actually run through them:

* ``torchaudio.transforms.MelSpectrogram`` — reimplemented on torch.stft
  following torchaudio's documented semantics (Spectrogram(power, center,
  pad_mode='reflect', onesided) -> melscale_fbanks(htk-or-slaney scale,
  optional slaney norm) matmul). Used by the reference mel front-end
  (ttts/vocoder/feature_extractors.py:73-99, ttts/vqvae/xtts_dvae.py:28-49).
* ``librosa.filters.mel`` — the documented slaney-scale slaney-norm
  triangular filterbank, used by the reference's `mel_spectrogram`
  (ttts/vocoder/feature_extractors.py:27-52).

Everything else is import-surface only (never executed by parity tests).
"""
from __future__ import annotations

import math
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _mk_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    # transformers probes importlib metadata; a None __spec__ raises.
    import importlib.machinery
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    m.__path__ = []  # mark as package so `import name.sub` is allowed
    sys.modules[name] = m
    return m


def _hz_to_mel(freq: float, mel_scale: str = "htk") -> float:
    """torchaudio.functional.functional._hz_to_mel semantics."""
    if mel_scale == "htk":
        return 2595.0 * math.log10(1.0 + freq / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    if freq >= min_log_hz:
        mels = min_log_mel + math.log(freq / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels, mel_scale: str = "htk"):
    import torch
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs[log_t] = min_log_hz * torch.exp(logstep * (mels[log_t] - min_log_mel))
    return freqs


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                    norm=None, mel_scale="htk"):
    """torchaudio.functional.melscale_fbanks documented math, in torch."""
    import torch
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down_slopes, up_slopes), min=0.0)
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm.unsqueeze(0)
    return fb


def _build_torchaudio() -> None:
    import torch
    from torch import nn

    ta = _mk_module("torchaudio")
    transforms = _mk_module("torchaudio.transforms")
    functional = _mk_module("torchaudio.functional")
    functional_inner = _mk_module("torchaudio.functional.functional")
    ta.transforms = transforms
    ta.functional = functional
    functional.functional = functional_inner
    functional_inner._hz_to_mel = _hz_to_mel
    functional_inner._mel_to_hz = _mel_to_hz
    functional.melscale_fbanks = melscale_fbanks

    def resample(waveform, orig_freq, new_freq):
        """Identity at equal rates; linear interpolation otherwise (enough
        for alignment parity tests, which run at the model rate)."""
        if orig_freq == new_freq:
            return waveform
        n_out = int(round(waveform.shape[-1] * new_freq / orig_freq))
        return nn.functional.interpolate(
            waveform.reshape(1, 1, -1).float(), size=n_out, mode="linear",
            align_corners=False).reshape(waveform.shape[:-1] + (n_out,))

    functional.resample = resample

    class Spectrogram(nn.Module):
        def __init__(self, n_fft=400, win_length=None, hop_length=None,
                     pad=0, power=2.0, normalized=False, center=True,
                     pad_mode="reflect", onesided=True, **_):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.power = power
            self.normalized = normalized
            self.center = center
            self.pad_mode = pad_mode
            self.register_buffer("window", torch.hann_window(self.win_length))

        def forward(self, waveform):
            shape = waveform.shape
            wav = waveform.reshape(-1, shape[-1])
            spec = torch.stft(
                wav, self.n_fft, hop_length=self.hop_length,
                win_length=self.win_length, window=self.window,
                center=self.center, pad_mode=self.pad_mode, normalized=False,
                onesided=True, return_complex=True)
            spec = spec.reshape(shape[:-1] + spec.shape[-2:])
            if self.power is not None:
                spec = spec.abs() ** self.power
            return spec

    class MelScale(nn.Module):
        def __init__(self, n_mels=128, sample_rate=16000, f_min=0.0,
                     f_max=None, n_stft=201, norm=None, mel_scale="htk"):
            super().__init__()
            f_max = f_max or float(sample_rate // 2)
            fb = melscale_fbanks(n_stft, f_min, f_max, n_mels, sample_rate,
                                 norm, mel_scale)
            self.register_buffer("fb", fb)

        def forward(self, specgram):
            return torch.matmul(specgram.transpose(-1, -2), self.fb).transpose(-1, -2)

    class MelSpectrogram(nn.Module):
        def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                     hop_length=None, f_min=0.0, f_max=None, pad=0,
                     n_mels=128, power=2.0, normalized=False, center=True,
                     pad_mode="reflect", onesided=True, norm=None,
                     mel_scale="htk", **_):
            super().__init__()
            self.sample_rate = sample_rate
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.power = power
            self.spectrogram = Spectrogram(
                n_fft=n_fft, win_length=self.win_length,
                hop_length=self.hop_length, power=power,
                normalized=normalized, center=center, pad_mode=pad_mode,
                onesided=onesided)
            self.mel_scale = MelScale(
                n_mels, sample_rate, f_min, f_max, n_fft // 2 + 1, norm,
                mel_scale)

        def forward(self, waveform):
            return self.mel_scale(self.spectrogram(waveform))

    class Resample(nn.Module):
        def __init__(self, orig_freq=16000, new_freq=16000, **_):
            super().__init__()
            self.orig_freq, self.new_freq = orig_freq, new_freq

        def forward(self, wav):
            if self.orig_freq == self.new_freq:
                return wav
            import torch.nn.functional as tF
            n = int(round(wav.shape[-1] * self.new_freq / self.orig_freq))
            return tF.interpolate(wav.reshape(1, 1, -1), size=n,
                                  mode="linear", align_corners=False).reshape(-1)

    transforms.Spectrogram = Spectrogram
    transforms.MelScale = MelScale
    transforms.MelSpectrogram = MelSpectrogram
    transforms.Resample = Resample

    def _unavailable(*a, **k):
        raise RuntimeError("torchaudio stub: IO not available in this image")

    ta.load = _unavailable
    ta.save = _unavailable


def _build_librosa() -> None:
    import numpy as np

    librosa = _mk_module("librosa")
    filters = _mk_module("librosa.filters")
    util = _mk_module("librosa.util")
    librosa.filters = filters
    librosa.util = util

    def _hz2mel_slaney(f):
        f = np.asarray(f, dtype=np.float64)
        mels = f / (200.0 / 3)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
                        mels)

    def _mel2hz_slaney(m):
        m = np.asarray(m, dtype=np.float64)
        freqs = m * (200.0 / 3)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False,
            norm="slaney", dtype=np.float32):
        """librosa.filters.mel documented math (slaney scale + slaney norm
        defaults), shape (n_mels, n_fft//2+1)."""
        if htk:
            raise NotImplementedError("stub covers slaney scale only")
        fmax = fmax if fmax is not None else sr / 2.0
        fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
        mel_f = _mel2hz_slaney(np.linspace(_hz2mel_slaney(fmin),
                                           _hz2mel_slaney(fmax), n_mels + 2))
        fdiff = np.diff(mel_f)
        ramps = mel_f[:, None] - fftfreqs[None, :]
        lower = -ramps[:-2] / fdiff[:-1, None]
        upper = ramps[2:] / fdiff[1:, None]
        weights = np.maximum(0, np.minimum(lower, upper))
        if norm == "slaney":
            enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
            weights *= enorm[:, None]
        return weights.astype(dtype)

    filters.mel = mel


def _build_misc_stubs() -> None:
    import torch
    from torch import nn

    if "torchvision" not in sys.modules:
        tv = _mk_module("torchvision")
        ops = _mk_module("torchvision.ops")
        misc = _mk_module("torchvision.ops.misc")
        tv.ops = ops
        ops.misc = misc
        misc.FrozenBatchNorm2d = nn.BatchNorm2d  # only referenced, never run

    if "k_diffusion" not in sys.modules:
        kd = _mk_module("k_diffusion")
        sampling = _mk_module("k_diffusion.sampling")
        kd.sampling = sampling

        def _kd_unavailable(*a, **k):
            raise RuntimeError("k_diffusion stub: not available")

        sampling.sample_dpmpp_2m = _kd_unavailable
        sampling.sample_euler_ancestral = _kd_unavailable

    if "rotary_embedding_torch" not in sys.modules:
        rot = _mk_module("rotary_embedding_torch")

        class RotaryEmbedding(nn.Module):  # import-surface only
            def __init__(self, dim, *a, **k):
                super().__init__()
                self.dim = dim

            def rotate_queries_or_keys(self, x):
                raise RuntimeError("rotary stub: not available")

        def broadcat(tensors, dim=-1):
            return torch.cat(tensors, dim=dim)

        rot.RotaryEmbedding = RotaryEmbedding
        rot.broadcat = broadcat

    if "encodec" not in sys.modules:
        enc = _mk_module("encodec")

        class EncodecModel:
            @staticmethod
            def encodec_model_24khz(*a, **k):
                raise RuntimeError("encodec stub: not available")

            @staticmethod
            def encodec_model_48khz(*a, **k):
                raise RuntimeError("encodec stub: not available")

        enc.EncodecModel = EncodecModel

    if "vocos" not in sys.modules:
        _mk_module("vocos")

    if "omegaconf" not in sys.modules:
        oc = _mk_module("omegaconf")
        lc = _mk_module("omegaconf.listconfig")
        oc.listconfig = lc

        class ListConfig(list):  # only isinstance-checked (aa_model.py:90-92)
            pass

        lc.ListConfig = ListConfig
        oc.ListConfig = ListConfig
        oc.OmegaConf = None  # never called on parity paths

    if "pypinyin" not in sys.modules:
        # constants-only: zh_normalization needs SUPPORT_UCS4; deliberately
        # NO Style/lazy_pinyin so xtts_tpu.text.pinyin's optional import
        # still falls back to the bundled lexicon.
        pp = _mk_module("pypinyin")
        constants = _mk_module("pypinyin.constants")
        pp.constants = constants
        constants.SUPPORT_UCS4 = True

    # transformers >= 4.4x removed the LogitsWarper alias the reference's
    # typical_sampling.py imports (ttts/utils/typical_sampling.py:2); the
    # modern base class is LogitsProcessor with identical surface. The
    # lazy transformers module replaces itself in sys.modules on first real
    # attribute access, so materialize it first, then inject on the final
    # module object.
    import transformers
    # Accessing a modeling class (not just a config) is what swaps the lazy
    # module for the real package in sys.modules — do it before injecting.
    transformers.GPT2PreTrainedModel
    lp = transformers.LogitsProcessor
    final = sys.modules["transformers"]
    if not hasattr(final, "LogitsWarper"):
        final.LogitsWarper = lp


def patch_reference_generate() -> None:
    """transformers >= 4.50 removed generate() from PreTrainedModel; mix
    GenerationMixin back into the reference's GPT2InferenceModel
    (ttts/gpt/model.py:36) so inference_speech works for parity tests."""
    from transformers.generation import GenerationMixin
    from ttts.gpt import model as ref_model

    if not issubclass(ref_model.GPT2InferenceModel, GenerationMixin):
        base = ref_model.GPT2InferenceModel
        orig_prepare = base.prepare_inputs_for_generation

        def prepare(self, input_ids, past_key_values=None, **kwargs):
            # era fix: old transformers passed past_key_values=None on the
            # first generate step; modern versions pass an EMPTY DynamicCache
            # which is truthy, so the reference's `if past_key_values:`
            # (ttts/gpt/model.py:82-84) would skip the full-prefix prefill
            # and never swap in the cached conditioning embeddings.
            if (past_key_values is not None
                    and hasattr(past_key_values, "get_seq_length")
                    and past_key_values.get_seq_length() == 0):
                past_key_values = None
            return orig_prepare(self, input_ids,
                                past_key_values=past_key_values, **kwargs)

        ref_model.GPT2InferenceModel = type(
            "GPT2InferenceModel", (base, GenerationMixin),
            {"prepare_inputs_for_generation": prepare})


_installed = False


def install_reference_stubs() -> None:
    """Idempotently install stubs and put /root/reference on sys.path."""
    global _installed
    if _installed:
        return
    if "torchaudio" not in sys.modules:
        _build_torchaudio()
    if "librosa" not in sys.modules:
        _build_librosa()
    _build_misc_stubs()
    # scipy >= 1.13 moved signal.cosine to signal.windows.cosine; the
    # reference MDCT/IMDCT ctors (ttts/vocoder/spectral_ops.py:95,151)
    # use the old name.
    import scipy.signal
    if not hasattr(scipy.signal, "cosine"):
        scipy.signal.cosine = scipy.signal.windows.cosine
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True
