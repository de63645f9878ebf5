"""Codec reconstruction losses: multi-resolution STFT with perceptual
A-weighting, spectral/waveform distances.

Reference: /root/reference/after/autoencoder/core.py (MultiResolutionSTFTLoss
:723, STFTLoss :508, SpectralDistance :146, WaveformDistance :56, FIRFilter
:335).  Everything is jnp on static shapes; filter taps are host-designed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import AETrainConfig
from ..ops import stft as stft_ops


def stft_magnitude(x: jnp.ndarray, n_fft: int, hop: int, win: int,
                   eps: float = 1e-8, center: bool = True,
                   dft_dtype=None) -> jnp.ndarray:
    """(B, T) -> (B, frames, bins) magnitudes (torch.stft conventions)."""
    z = stft_ops.stft(x, n_fft, hop, win, center=center, dft_dtype=dft_dtype)
    return jnp.sqrt(jnp.maximum(jnp.real(z) ** 2 + jnp.imag(z) ** 2, eps))


def stft_loss(x: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int, win: int,
              w_sc: float = 1.0, w_log_mag: float = 1.0,
              w_lin_mag: float = 0.0, center: bool = True,
              dft_dtype=None) -> jnp.ndarray:
    """Single-scale loss: spectral convergence + log/linear magnitude L1
    (core.py:671-720).  x, y: (B, T) pre-filtered waveforms."""
    x_mag = stft_magnitude(x, n_fft, hop, win, center=center,
                           dft_dtype=dft_dtype)
    y_mag = stft_magnitude(y, n_fft, hop, win, center=center,
                           dft_dtype=dft_dtype)
    loss = 0.0
    if w_sc:
        sc = (jnp.linalg.norm(y_mag - x_mag, axis=(-2, -1))
              / jnp.maximum(jnp.linalg.norm(y_mag, axis=(-2, -1)), 1e-12))
        loss += w_sc * jnp.mean(sc)
    if w_log_mag:
        loss += w_log_mag * jnp.mean(jnp.abs(jnp.log(x_mag) - jnp.log(y_mag)))
    if w_lin_mag:
        loss += w_lin_mag * jnp.mean(jnp.abs(x_mag - y_mag))
    return loss


def multi_resolution_stft_loss(x: jnp.ndarray, y: jnp.ndarray,
                               cfg: AETrainConfig,
                               sr: int = 44100) -> jnp.ndarray:
    """MR-STFT loss over cfg scales with optional A-weighting prefilter
    (core.py:723-813; baseAE.gin:87-100).  x, y: (B, T, 1) waveforms."""
    xw, yw = x[..., 0], y[..., 0]
    if cfg.perceptual_weighting:
        taps = stft_ops.a_weighting_fir(sr)
        xw = stft_ops.fir_prefilter(xw, taps)
        yw = stft_ops.fir_prefilter(yw, taps)
    # One shared reflect pad instead of a per-scale center pad: each scale
    # slices its centered window out of the wide pad (numerically identical
    # to center=True per scale), so the backward pays ONE pad-VJP scatter
    # per signal instead of len(scales).
    T = xw.shape[-1]
    P = max(cfg.stft_fft_sizes) // 2
    xp = jnp.pad(xw, [(0, 0)] * (xw.ndim - 1) + [(P, P)], mode="reflect")
    yp = jnp.pad(yw, [(0, 0)] * (yw.ndim - 1) + [(P, P)], mode="reflect")
    # opt-in: DFT matmuls with bf16 operands + f32 accumulation (2x MXU
    # rate; ~0.4% input quantization on the windowed frames, magnitudes and
    # all loss math stay f32)
    dd = (jnp.bfloat16 if getattr(cfg, "stft_bf16_dft", False) else None)
    total = 0.0
    for n_fft, hop, win in zip(cfg.stft_fft_sizes, cfg.stft_hop_sizes,
                               cfg.stft_win_lengths):
        off = P - n_fft // 2
        xs = xp[..., off:off + T + n_fft]
        ys = yp[..., off:off + T + n_fft]
        total += stft_loss(xs, ys, n_fft, hop, win, cfg.stft_w_sc,
                           cfg.stft_w_log_mag, cfg.stft_w_lin_mag,
                           center=False, dft_dtype=dd)
    return total / len(cfg.stft_fft_sizes)


def waveform_distance(x: jnp.ndarray, y: jnp.ndarray,
                      norm: str = "L1") -> jnp.ndarray:
    """core.py:56-75 (rave mode)."""
    d = y - x
    return jnp.mean(jnp.abs(d)) if norm == "L1" else jnp.mean(d * d)


def spectral_distance(x: jnp.ndarray, y: jnp.ndarray, sr: int,
                      scales: Sequence[int],
                      mel_bands: Optional[Sequence[int]]) -> jnp.ndarray:
    """Multi-scale (mel-)spectrogram lin+log L1 distance (core.py:78-175).

    x, y: (B, T, 1)."""
    xw, yw = x[..., 0], y[..., 0]
    total = 0.0
    mel_bands = mel_bands or [None] * len(scales)
    for n_fft, mel in zip(scales, mel_bands):
        hop = n_fft // 4
        if mel:
            sx = stft_ops.mel_spectrogram(xw, sr, n_fft, hop, mel)
            sy = stft_ops.mel_spectrogram(yw, sr, n_fft, hop, mel)
        else:
            sx = stft_ops.spectrogram(xw, n_fft, hop, normalized=True,
                                      center=False)
            sy = stft_ops.spectrogram(yw, n_fft, hop, normalized=True,
                                      center=False)
        total += jnp.mean(jnp.abs(sx - sy))
        total += jnp.mean(jnp.abs(jnp.log1p(sx) - jnp.log1p(sy)))
    return total
