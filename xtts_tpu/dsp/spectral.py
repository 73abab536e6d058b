"""STFT / iSTFT as jit-friendly XLA ops.

TPU-first design: framing is an im2col (`conv_general_dilated_patches`) so the
window-multiply + rfft fuse into a single XLA computation; the inverse is an
irfft + scatter-add overlap-add. No data-dependent shapes — frame counts are
static functions of input length.

Semantics match the reference exactly:
* forward STFT = torch.stft(center=True|False, hann, onesided, normalized=False)
  as used by torchaudio MelSpectrogram (ttts/vocoder/feature_extractors.py:80-99)
  and the librosa-style variant with manual reflect pad
  (ttts/vocoder/feature_extractors.py:41-48).
* ISTFT "same"/"center" padding with window-envelope normalization matches
  ttts/vocoder/spectral_ops.py:7-75 (used by the Vocos ISTFTHead).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _reflect_pad_1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad last axis (torch 'reflect' mode, no edge duplication)."""
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_length) via static gather.

    A gather with a precomputed (n_frames, frame_length) index grid compiles
    in milliseconds; the previous conv_general_dilated_patches im2col made
    XLA build (and constant-fold) a frame_length^2 identity kernel — ~90 s of
    compile for a 1024-tap window.
    """
    b, t = x.shape
    n_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(frame_length)[None, :])
    return x[:, jnp.asarray(idx)]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    magnitude: bool = False,
    mag_eps: float = 0.0,
):
    """Short-time Fourier transform of (B, T) -> complex (B, n_fft//2+1, frames).

    center=True reflect-pads by n_fft//2 (torch.stft default used by
    torchaudio.transforms.Spectrogram). Returns magnitude if requested:
    sqrt(re^2+im^2+mag_eps) to match ttts/vocoder/feature_extractors.py:48.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:  # torch centers the window inside n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        x = _reflect_pad_1d(x, n_fft // 2)
    frames = frame_signal(x, n_fft, hop_length)  # (B, F, n_fft)
    frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, F, n_fft//2+1)
    spec = jnp.transpose(spec, (0, 2, 1))  # (B, bins, F)
    if magnitude:
        re, im = jnp.real(spec), jnp.imag(spec)
        return jnp.sqrt(re * re + im * im + mag_eps)
    return spec


def overlap_add(frames: jnp.ndarray, hop: int, output_size: int) -> jnp.ndarray:
    """(B, n_frames, win) -> (B, output_size) scatter-add overlap-add."""
    b, n_frames, win = frames.shape
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]).reshape(-1)
    out = jnp.zeros((b, output_size), dtype=frames.dtype)
    return out.at[:, jnp.asarray(idx)].add(frames.reshape(b, -1))


def _mdct_basis(n: int) -> jnp.ndarray:
    """(n, n/2) cosine basis cos(pi/M (k + 0.5 + M/2)(m + 0.5)), M = n/2."""
    half = n // 2
    k = jnp.arange(n, dtype=jnp.float32)[:, None]
    m = jnp.arange(half, dtype=jnp.float32)[None, :]
    return jnp.cos(jnp.pi / half * (k + 0.5 + half / 2) * (m + 0.5))


def _mdct_pad(frame_len: int, padding: str) -> int:
    """Edge zero-pad per side (ttts/vocoder/spectral_ops.py MDCT.forward
    "same" = frame_len//4, "center" = frame_len//2)."""
    if padding == "same":
        return frame_len // 4
    if padding == "center":
        return frame_len // 2
    raise ValueError("Padding must be 'center' or 'same'.")


def mdct(x: jnp.ndarray, frame_len: int, padding: str = "same") -> jnp.ndarray:
    """Modified DCT of (B, T) -> (B, frames, frame_len//2) with sine window
    and 50% overlap — numerically equal to the reference's FFT-twiddle MDCT
    (ttts/vocoder/spectral_ops.py:78-131: zero edge pad, scipy cosine
    window, sqrt(2/N) scaling). Direct matmul against the cosine basis —
    frame_len is small, so this is one MXU matmul rather than the FFT
    identity; the twiddle algebra reduces to
    sqrt(2/N) * sum_n x_n cos(pi/N (n + (N+1)/2)(k + 0.5)), N = frame_len/2,
    which is exactly `_mdct_basis`."""
    n = frame_len
    half = n // 2
    pad = _mdct_pad(n, padding)
    window = jnp.sin(jnp.pi / n * (jnp.arange(n) + 0.5))  # scipy cosine win
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    frames = frame_signal(x, n, half) * window[None, None, :]
    return (frames @ _mdct_basis(n)) * np.sqrt(2.0 / half)


def imdct(coeffs: jnp.ndarray, frame_len: int,
          padding: str = "same") -> jnp.ndarray:
    """Inverse MDCT of (B, frames, frame_len//2) -> (B, T): synthesis matmul,
    sine window, TDAC overlap-add, edge trim — numerically equal to the
    reference's FFT-twiddle IMDCT (ttts/vocoder/spectral_ops.py:133-191:
    sqrt(2N)-scaled ifft + fold + trim). Output length is
    frames*N for "same", (frames-1)*N for "center"; perfect reconstruction
    away from the padded edges."""
    n = frame_len
    half = n // 2
    b, t, _ = coeffs.shape
    window = jnp.sin(jnp.pi / n * (jnp.arange(n) + 0.5))
    frames = np.sqrt(2.0 / half) * (coeffs @ _mdct_basis(n).T)  # (B, T, n)
    frames = frames * window[None, None, :]
    out_len = (t + 1) * half
    y = overlap_add(frames, half, out_len)
    pad = _mdct_pad(n, padding)
    return y[:, pad:out_len - pad]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "padding"))
def istft(
    spec_real: jnp.ndarray,
    spec_imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    padding: str = "same",
) -> jnp.ndarray:
    """Inverse STFT of complex (B, bins, T) given as (real, imag).

    Mirrors the custom ISTFT of ttts/vocoder/spectral_ops.py:33-75: irfft per
    frame, window, fold overlap-add, divide by the window envelope, and trim
    `pad` samples each side ("same": pad = (win-hop)//2; "center": pad = n_fft//2).
    """
    win_length = win_length or n_fft
    window = hann_window(win_length, dtype=spec_real.dtype)
    spec = jax.lax.complex(spec_real, spec_imag)  # (B, bins, T)
    b, bins, t = spec.shape
    frames = jnp.fft.irfft(jnp.transpose(spec, (0, 2, 1)), n=n_fft, axis=-1)
    frames = frames[..., :win_length] * window[None, None, :]
    output_size = (t - 1) * hop_length + win_length
    y = overlap_add(frames, hop_length, output_size)

    win_sq = jnp.tile((window * window)[None, :], (t, 1))  # (T, win)
    env = overlap_add(win_sq[None], hop_length, output_size)[0]

    if padding == "same":
        pad = (win_length - hop_length) // 2
    elif padding == "center":
        pad = n_fft // 2
    else:
        raise ValueError("padding must be 'same' or 'center'")
    y = y[:, pad : output_size - pad]
    env = env[pad : output_size - pad]
    env = jnp.maximum(env, 1e-11)
    return y / env[None, :]
