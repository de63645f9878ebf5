"""Stream-stateful spectral front-ends: mel spectrogram and CQT.

Reference: /root/reference/utils/transforms.py (StreamableMelSpectrogram :8
with its audio ring buffer :21-54, StreamableCQT :68 via nnAudio).  Flax
modules whose ring buffer lives in the `cache` collection, so chunked calls
produce frames identical to an offline transform over the concatenated audio.

The CQT is implemented from scratch (nnAudio is unavailable): a bank of
complex log-spaced Gabor atoms applied as a conv — magnitudes returned.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import stft as stft_ops


class StreamableMelSpectrogram(nn.Module):
    """(B, chunk, 1) audio chunks -> (B, frames, n_mels) mel frames with an
    audio ring buffer carrying the window overlap."""

    sr: int = 44100
    n_fft: int = 2048
    hop: int = 512
    n_mels: int = 80
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        context = self.n_fft - self.hop
        if self.streaming:
            ring = self.variable(
                "cache", "audio_ring",
                lambda: jnp.zeros((x.shape[0], context, 1), x.dtype))
            x = jnp.concatenate([ring.value, x], axis=1)
            ring.value = x[:, -context:]
            spec = stft_ops.spectrogram(x[..., 0], self.n_fft, self.hop,
                                        power=2.0, center=False)
        else:
            spec = stft_ops.spectrogram(x[..., 0], self.n_fft, self.hop,
                                        power=2.0, center=False)
        fb = jnp.asarray(stft_ops.mel_filterbank(self.sr, self.n_fft,
                                                 self.n_mels, htk=True))
        return jnp.einsum("btf,mf->btm", spec, fb)


@lru_cache(maxsize=8)
def cqt_kernels(sr: int, fmin: float, n_bins: int, bins_per_octave: int
                ) -> Tuple[np.ndarray, int]:
    """Complex Gabor atom bank (n_bins, kernel_len) + hop-friendly length."""
    Q = 1.0 / (2 ** (1.0 / bins_per_octave) - 1)
    freqs = fmin * 2 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.ceil(Q * sr / freqs).astype(int)
    max_len = int(2 ** np.ceil(np.log2(lengths.max())))
    kernels = np.zeros((n_bins, max_len), dtype=np.complex64)
    for i, (f, L) in enumerate(zip(freqs, lengths)):
        n = np.arange(L) - L // 2
        window = np.hanning(L)
        atom = window * np.exp(2j * np.pi * f * n / sr) / L
        start = (max_len - L) // 2
        kernels[i, start:start + L] = atom
    return kernels, max_len


class StreamableCQT(nn.Module):
    """(B, chunk, 1) audio -> (B, frames, n_bins) CQT magnitudes; streaming
    keeps the atom-length overlap in a ring buffer."""

    sr: int = 44100
    fmin: float = 32.70          # C1
    n_bins: int = 84
    bins_per_octave: int = 12
    hop: int = 512
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernels, klen = cqt_kernels(self.sr, self.fmin, self.n_bins,
                                    self.bins_per_octave)
        context = klen - self.hop
        if self.streaming:
            ring = self.variable(
                "cache", "audio_ring",
                lambda: jnp.zeros((x.shape[0], context, 1), x.dtype))
            x = jnp.concatenate([ring.value, x], axis=1)
            ring.value = x[:, -context:]
        frames = stft_ops.frame_signal(x[..., 0], klen, self.hop)
        kr = jnp.asarray(np.real(kernels))       # (bins, klen)
        ki = jnp.asarray(np.imag(kernels))
        re = jnp.einsum("btk,fk->btf", frames, kr)
        im = jnp.einsum("btk,fk->btf", frames, ki)
        return jnp.sqrt(re * re + im * im + 1e-12)
