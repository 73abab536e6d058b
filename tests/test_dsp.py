"""DSP parity tests.

The reference front-end is torchaudio MelSpectrogram(power=1) + safe_log
(ttts/vocoder/feature_extractors.py:73-99). torchaudio is not in this image,
but torch core is — so we check the STFT against torch.stft directly and the
mel filterbank against the published htk/slaney formulas, which is what
torchaudio/librosa compute.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from xtts_tpu.core.config import MelConfig
from xtts_tpu.dsp.mel import LIBROSA_MEL_CONFIG, MelFrontend, mel_filterbank, safe_log
from xtts_tpu.dsp.spectral import hann_window, istft, stft


def _rand_wav(rng, b=2, t=24000):
    return (rng.standard_normal((b, t)) * 0.1).astype(np.float32)


class TestSTFT:
    def test_matches_torch_stft_center(self, rng):
        x = _rand_wav(rng)
        n_fft, hop = 1024, 256
        ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, center=True))
        theirs = torch.stft(
            torch.from_numpy(x), n_fft, hop_length=hop,
            window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
            return_complex=True, normalized=False, onesided=True,
        ).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)

    def test_matches_torch_stft_nocenter(self, rng):
        x = _rand_wav(rng)
        ours = np.asarray(stft(jnp.asarray(x), 1024, 256, center=False))
        theirs = torch.stft(
            torch.from_numpy(x), 1024, hop_length=256,
            window=torch.hann_window(1024), center=False,
            return_complex=True, normalized=False, onesided=True,
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)

    def test_magnitude_power1(self, rng):
        x = _rand_wav(rng, b=1)
        mag = np.asarray(stft(jnp.asarray(x), 1024, 256, magnitude=True))
        ref = np.abs(
            torch.stft(torch.from_numpy(x), 1024, hop_length=256,
                       window=torch.hann_window(1024), center=True,
                       return_complex=True).numpy())
        np.testing.assert_allclose(mag, ref, atol=2e-3, rtol=1e-4)


class TestMelFilterbank:
    def test_htk_shape_and_partition(self):
        fb = mel_filterbank(24000, 1024, 100)  # torchaudio defaults: htk, no norm
        assert fb.shape == (513, 100)
        assert (fb >= 0).all()
        # every filter has some support
        assert (fb.sum(axis=0) > 0).all()

    def test_slaney_norm_scales_by_bandwidth(self):
        fb = mel_filterbank(24000, 1024, 80, fmax=8000, scale="slaney", norm="slaney")
        fb_un = mel_filterbank(24000, 1024, 80, fmax=8000, scale="slaney", norm=None)
        # slaney norm divides by half the filter bandwidth -> peaks shrink
        assert fb.max() < fb_un.max()

    def test_htk_formula_inversion(self):
        from xtts_tpu.dsp.mel import hz_to_mel, mel_to_hz
        f = np.linspace(10, 11000, 50)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, "htk"), "htk"), f, rtol=1e-9)
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, "slaney"), "slaney"), f, rtol=1e-9)


class TestMelFrontend:
    def test_shapes_24k_100bin(self, rng):
        fe = MelFrontend(MelConfig())
        x = _rand_wav(rng, b=2, t=24000)
        mel = np.asarray(fe(x))
        # torch.stft(center=True): frames = T // hop + 1
        assert mel.shape == (2, 100, 24000 // 256 + 1)

    def test_log_clamp_floor(self):
        fe = MelFrontend(MelConfig())
        silent = np.zeros((1, 4096), np.float32)
        mel = np.asarray(fe(silent))
        np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-4)

    def test_librosa_variant_shapes(self, rng):
        fe = MelFrontend(LIBROSA_MEL_CONFIG)
        x = _rand_wav(rng, b=1, t=24000)
        mel = np.asarray(fe(x))
        # manual pad (n_fft-hop)/2 both sides, center=False:
        # frames = (T + 2*384 - 1024)//256 + 1
        assert mel.shape == (1, 80, (24000 + 768 - 1024) // 256 + 1)

    def test_single_sine_peak_bin(self):
        # 1 kHz tone should put energy near the 1 kHz mel filter
        sr = 24000
        t = np.arange(sr, dtype=np.float32) / sr
        x = np.sin(2 * np.pi * 1000 * t)[None]
        fe = MelFrontend(MelConfig())
        mel = np.asarray(fe(x))[0]
        peak = mel.mean(axis=1).argmax()
        from xtts_tpu.dsp.mel import hz_to_mel
        # which mel bin should 1 kHz fall into (htk spacing to nyquist)
        m = hz_to_mel(np.array([1000.0]), "htk")[0]
        lo, hi = hz_to_mel(np.array([0.0]), "htk")[0], hz_to_mel(np.array([12000.0]), "htk")[0]
        expect = int((m - lo) / (hi - lo) * 100)
        assert abs(int(peak) - expect) <= 2


class TestISTFT:
    @pytest.mark.parametrize("padding", ["same", "center"])
    def test_roundtrip(self, rng, padding):
        x = _rand_wav(rng, b=2, t=8192)
        n_fft, hop = 1024, 256
        if padding == "center":
            spec = stft(jnp.asarray(x), n_fft, hop, center=True)
        else:
            from xtts_tpu.dsp.spectral import _reflect_pad_1d
            pad = (n_fft - hop) // 2
            spec = stft(_reflect_pad_1d(jnp.asarray(x), pad), n_fft, hop, center=False)
        y = np.asarray(istft(jnp.real(spec), jnp.imag(spec), n_fft, hop, padding=padding))
        n = min(y.shape[1], x.shape[1])
        # interior reconstruction must be near-exact (NOLA satisfied)
        np.testing.assert_allclose(y[:, hop:n - hop], x[:, hop:n - hop], atol=1e-3)

    def test_matches_torch_istft_center(self, rng):
        x = _rand_wav(rng, b=1, t=8192)
        spec_t = torch.stft(torch.from_numpy(x), 1024, 256,
                            window=torch.hann_window(1024), center=True,
                            return_complex=True)
        ref = torch.istft(spec_t, 1024, 256, window=torch.hann_window(1024),
                          center=True).numpy()
        y = np.asarray(istft(jnp.asarray(spec_t.real.numpy()),
                             jnp.asarray(spec_t.imag.numpy()), 1024, 256,
                             padding="center"))
        n = min(y.shape[1], ref.shape[1])
        np.testing.assert_allclose(y[:, 256:n-256], ref[:, 256:n-256], atol=1e-3)


def test_safe_log():
    x = jnp.asarray([0.0, 1e-6, 1.0])
    out = np.asarray(safe_log(x))
    np.testing.assert_allclose(out, [np.log(1e-5), np.log(1e-5), 0.0], atol=1e-6)
