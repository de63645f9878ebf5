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
from typing import Tuple

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


# ---------------------------------------------------------------------------
# Multi-rate CQT (CQT2010-style: top-octave kernels over a downsampling
# pyramid) — needed for low fmin without huge kernels (basic-pitch frontend).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _octave_kernels(sr: int, f_low: float, n_bins: int, bins_per_octave: int
                    ) -> Tuple[np.ndarray, int]:
    """Gabor atoms for one octave [f_low, 2*f_low) at sample rate sr."""
    Q = 1.0 / (2 ** (1.0 / bins_per_octave) - 1)
    freqs = f_low * 2 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.ceil(Q * sr / freqs).astype(int)
    klen = int(2 ** np.ceil(np.log2(lengths.max())))
    kernels = np.zeros((n_bins, klen), dtype=np.complex64)
    for i, (f, L) in enumerate(zip(freqs, lengths)):
        n = np.arange(L) - L // 2
        atom = np.hanning(L) * np.exp(2j * np.pi * f * n / sr) / L
        start = (klen - L) // 2
        kernels[i, start:start + L] = atom
    return kernels, klen


@lru_cache(maxsize=4)
def _halfband_filter(taps: int = 64) -> np.ndarray:
    import scipy.signal
    return scipy.signal.firwin(2 * taps + 1, 0.5).astype(np.float32)


def multirate_cqt(x: jnp.ndarray, sr: int, fmin: float, n_bins: int,
                  bins_per_octave: int, hop: int) -> jnp.ndarray:
    """(B, T) audio -> (B, T//hop, n_bins) CQT magnitudes.

    CQT2010-style: short kernels for the top octave, applied to a 2x
    anti-aliased downsampling pyramid for each lower octave; hop divides by 2
    per level so all octaves share the frame grid.
    """
    B, T = x.shape
    n_frames = T // hop
    n_octaves = int(np.ceil(n_bins / bins_per_octave))
    f_top_low = fmin * 2 ** (n_octaves - 1)    # low edge of top octave
    top_bins = n_bins - (n_octaves - 1) * bins_per_octave
    hb = jnp.asarray(_halfband_filter())[:, None, None]

    outs = []
    cur = x[..., None]
    for g in range(n_octaves):
        # kernels are always designed at full rate for the top octave band;
        # on the 2^g-downsampled signal they analyse [f_top_low/2^g, ...)
        if g == 0:
            # partial top octave keeps only its highest `top_bins` bins,
            # which start exactly at f_top_low
            kern, klen = _octave_kernels(sr, f_top_low, top_bins,
                                         bins_per_octave)
        else:
            kern, klen = _octave_kernels(sr, f_top_low, bins_per_octave,
                                         bins_per_octave)
        hop_g = hop // (2 ** g)
        if hop_g < 1:
            break
        # pad so frame i is centred at i*hop_g (matching across octaves)
        sig = jnp.pad(cur[..., 0], ((0, 0), (klen // 2, klen)))
        frames = stft_ops.frame_signal(sig, klen, hop_g)[:, :n_frames]
        if frames.shape[1] < n_frames:
            frames = jnp.pad(frames, ((0, 0),
                                      (0, n_frames - frames.shape[1]),
                                      (0, 0)))
        re = jnp.einsum("btk,fk->btf", frames, jnp.asarray(np.real(kern)))
        im = jnp.einsum("btk,fk->btf", frames, jnp.asarray(np.imag(kern)))
        mag = jnp.sqrt(re * re + im * im + 1e-12)
        outs.append(mag)
        # downsample 2x for the next (lower) octave
        pad = hb.shape[0] // 2
        cur = jax.lax.conv_general_dilated(
            cur, hb, (2,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"))
    # outs[0] = top octave ... outs[-1] = lowest; stack low->high bins
    full = jnp.concatenate(list(reversed(outs)), axis=-1)
    return full[..., :n_bins]
