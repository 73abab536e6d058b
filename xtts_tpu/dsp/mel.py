"""Log-mel front-end: filterbank construction + jitted wav->mel.

The whole front-end compiles to: reflect-pad -> im2col -> window -> rfft ->
|.| -> one (bins x n_mels) matmul -> safe_log. The filterbank matmul lands on
the MXU; everything else fuses around it.

Parity targets:
* `MelFrontend` (htk scale, no norm, power=1, center) == reference
  MelSpectrogramFeatures + safe_log (ttts/vocoder/feature_extractors.py:73-99),
  i.e. torchaudio.transforms.MelSpectrogram(power=1) |> log(clamp(1e-5)).
* slaney scale + slaney norm + center=False manual pad == reference
  `mel_spectrogram` / MelSpectrogramFeatures1
  (ttts/vocoder/feature_extractors.py:27-121, used for vqvae `mel_type:
  librosa` per ttts/vqvae/dataset.py:27-30).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xtts_tpu.core.config import MelConfig
from xtts_tpu.dsp.spectral import hann_window, stft, _reflect_pad_1d


def hz_to_mel(f: np.ndarray, scale: str = "htk") -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    f_safe = np.maximum(f, min_log_hz)
    return np.where(f >= min_log_hz, min_log_mel + np.log(f_safe / min_log_hz) / logstep, mels)


def mel_to_hz(m: np.ndarray, scale: str = "htk") -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "htk",
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_fft//2 + 1, n_mels).

    scale/norm (htk, None) matches torchaudio.functional.melscale_fbanks
    defaults; (slaney, slaney) matches librosa.filters.mel defaults.
    """
    fmax = fmax if fmax is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    m_pts = np.linspace(hz_to_mel(fmin, scale), hz_to_mel(fmax, scale), n_mels + 2)
    f_pts = mel_to_hz(m_pts, scale)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (bins, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]            # rising edge
    up = slopes[:, 2:] / f_diff[None, 1:]                 # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))            # (bins, n_mels)
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def safe_log(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip)) — ttts/vocoder/modules.py safe_log /
    dynamic_range_compression (ttts/vocoder/feature_extractors.py:14-15)."""
    return jnp.log(jnp.clip(x, min=clip_val))


class MelFrontend:
    """wav (B, T) float in [-1,1] -> log-mel (B, n_mels, frames).

    Precomputes the filterbank and window once; `__call__` is jitted with the
    config frozen in the closure, so repeated calls hit the compile cache.
    """

    def __init__(self, cfg: MelConfig = MelConfig()):
        self.cfg = cfg
        self.filterbank = jnp.asarray(
            mel_filterbank(
                cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.mel_fmin, cfg.mel_fmax,
                scale=cfg.mel_scale, norm=cfg.mel_norm,
            )
        )
        self.window = hann_window(cfg.win_length)
        self._fn = jax.jit(self._forward)

    def _forward(self, wav: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.padding == "center":
            mag = stft(
                wav, cfg.n_fft, cfg.hop_length, cfg.win_length, self.window,
                center=True, magnitude=True,
            )
            if cfg.power != 1.0:
                mag = mag ** cfg.power
        else:
            # librosa-variant: manual reflect pad of (n_fft-hop)/2 then
            # center=False, magnitude with +1e-9 under the sqrt
            pad = int((cfg.n_fft - cfg.hop_length) / 2)
            wav = _reflect_pad_1d(wav, pad)
            mag = stft(
                wav, cfg.n_fft, cfg.hop_length, cfg.win_length, self.window,
                center=False, magnitude=True, mag_eps=1e-9,
            )
            if cfg.power != 1.0:
                mag = mag ** cfg.power
        mel = jnp.einsum("bft,fm->bmt", mag, self.filterbank)
        return safe_log(mel, cfg.log_clip)

    def __call__(self, wav) -> jnp.ndarray:
        wav = jnp.asarray(wav)
        if wav.ndim == 1:
            wav = wav[None]
        return self._fn(wav)


@functools.lru_cache(maxsize=8)
def default_frontend() -> MelFrontend:
    return MelFrontend(MelConfig())


# Reference-audio mel for VQVAE trained with librosa mels (80-bin, fmax 8000,
# slaney) — MelSpectrogramFeatures1 (ttts/vocoder/feature_extractors.py:102-121)
LIBROSA_MEL_CONFIG = MelConfig(
    n_mels=80, mel_fmax=8000.0, mel_scale="slaney", mel_norm="slaney",
    padding="same", power=1.0,
)

# Legacy tortoise 22.05 kHz mel (dvae_wav_to_mel, ttts/vqvae/xtts_dvae.py:28-49):
# 80 bins, 1024/256/1024, fmax 8000, POWER 2, torchaudio-default HTK scale with
# norm="slaney". Parity-pinned by tests/test_reference_parity.py
# (divide by the checkpoint's mel_norms afterwards, :48-49).
LEGACY_TORTOISE_MEL_CONFIG = MelConfig(
    sample_rate=22050, n_mels=80, n_fft=1024, hop_length=256, win_length=1024,
    mel_fmin=0.0, mel_fmax=8000.0, mel_scale="htk", mel_norm="slaney",
    padding="center", power=2.0,
)

# TacotronSTFT mel (ttts/utils/stft.py:271): librosa filterbank
# (slaney scale + slaney norm), power-1 magnitude, 22.05 kHz.
TACOTRON_MEL_CONFIG = MelConfig(
    sample_rate=22050, n_mels=80, n_fft=1024, hop_length=256, win_length=1024,
    mel_fmin=0.0, mel_fmax=8000.0, mel_scale="slaney", mel_norm="slaney",
    padding="center", power=1.0,
)

# 16 kHz 64-bin mel for the HiFi-GAN speaker encoder
# (ttts/hifigan/hifigan_vocoder.py:671-678 audio_config)
SPEAKER_ENCODER_MEL_CONFIG = MelConfig(
    sample_rate=16000, n_mels=64, n_fft=512, win_length=400, hop_length=160,
)
