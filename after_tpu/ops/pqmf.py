"""Pseudo-QMF multiband analysis/synthesis for the streamable codec.

TPU-native rebuild of the reference PQMF (/root/reference/after/autoencoder/
networks/pqmf.py:186).  Filter design happens once on the host with scipy
(Kaiser-window prototype, cutoff optimised per the classic near-perfect-
reconstruction objective, https://ieeexplore.ieee.org/document/681427); the
runtime path is two static jitted convolutions in (B, T, C) layout:

- analysis:  waveform (B, T, 1)  -> bands (B, T/M, M)   via polyphase conv
- synthesis: bands    (B, T/M, M) -> waveform (B, T, 1)

The polyphase formulation turns a length-L FIR bank into an (L/M)-tap conv
with M in/out channels — an MXU-friendly dense contraction instead of M
strided filters.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import fmin
from scipy.signal import firwin, kaiserord


def _kaiser_filter(wc: float, atten: float, N: int = None) -> np.ndarray:
    """Kaiser-window lowpass prototype at angular cutoff ``wc``."""
    N_, beta = kaiserord(atten, wc / np.pi)
    N_ = 2 * (N_ // 2) + 1  # make odd
    N = N if N is not None else N_
    return firwin(N, wc, window=("kaiser", beta), scale=False, fs=2 * np.pi)


def _alias_objective(wc: float, atten: float, M: int, N: int) -> float:
    h = _kaiser_filter(wc, atten, N)
    g = np.convolve(h, h[::-1], "full")
    g = np.abs(g[g.shape[-1] // 2::2 * M][1:])
    return float(np.max(g))


@lru_cache(maxsize=16)
def design_prototype(attenuation: float, n_band: int, N: int = None) -> np.ndarray:
    """Optimise the prototype lowpass for minimal aliasing at M bands."""
    wc = fmin(lambda w: _alias_objective(float(np.asarray(w).ravel()[0]),
                                        attenuation, n_band, N),
              1.0 / n_band, disp=0)[0]
    return _kaiser_filter(float(wc), attenuation, N)


def qmf_bank(h: np.ndarray, n_band: int) -> np.ndarray:
    """Cosine-modulate the prototype into an (M, L) analysis bank."""
    k = np.arange(n_band)[:, None]
    N = h.shape[-1]
    t = np.arange(-(N // 2), N // 2 + 1)
    p = (-1.0) ** k * np.pi / 4
    mod = np.cos((2 * k + 1) * np.pi / (2 * n_band) * t + p)
    return 2 * h * mod


def _center_pad_next_pow2(hk: np.ndarray) -> np.ndarray:
    next2 = 2 ** math.ceil(math.log2(hk.shape[-1]))
    pad = next2 - hk.shape[-1]
    return np.pad(hk, [(0, 0), (pad // 2, pad // 2 + pad % 2)])


class PQMF:
    """Polyphase PQMF; host-designed filters, jitted TPU analysis/synthesis.

    Sample-alignment matches the reference polyphase implementation
    (pqmf.py:95-140) so ported codec weights see identical band signals.
    """

    def __init__(self, attenuation: float = 100, n_band: int = 16):
        if n_band > 1:
            power = math.log2(n_band)
            assert power == math.floor(power), "n_band must be a power of 2"
        self.n_band = n_band
        if n_band == 1:
            self.hk = np.ones((1, 1), dtype=np.float32)
            self.taps = 1
            self._ana_kernel = None
            self._syn_kernel = None
            return
        h = design_prototype(attenuation, n_band)
        hk = _center_pad_next_pow2(qmf_bank(h, n_band)).astype(np.float32)
        self.hk = hk                         # (M, L), L = pow2
        M, L = hk.shape
        self.taps = L // M
        # Analysis polyphase kernel.  Reference: hk 'c (t m) -> c m t' then
        # torch conv (out=M, in=M, K).  Our WIO layout: (K, in=M, out=M).
        ana = hk.reshape(M, L // M, M)       # (band, tap, phase)
        self._ana_kernel = np.ascontiguousarray(np.transpose(ana, (1, 2, 0)))  # (K, M_in=phase, M_out=band)
        # Synthesis kernel.  Reference: flip taps, 'c (t m) -> m c t'
        # -> torch conv (out=M=phase, in=M=band, K).
        hki = hk[:, ::-1].reshape(M, L // M, M)   # (band, tap, phase)
        syn = np.transpose(hki, (1, 0, 2))        # (K, in=band, out=phase)
        self._syn_kernel = np.ascontiguousarray(syn)

        # sign mask applied after analysis / before synthesis
        # (reference reverse_half, pqmf.py:16: bands odd, time even -> -1)
        mask = np.ones((2, M), dtype=np.float32)  # (time parity, band)
        mask[0, 1::2] = -1.0
        self._mask2 = mask

    def _apply_mask(self, x: jnp.ndarray, parity: int = 0) -> jnp.ndarray:
        """reverse_half sign mask; `parity` shifts the period-2 time pattern.

        A streamed band signal arrives delayed by the upstream (static) conv
        delay d; the mask must follow the signal, so synthesis applies it
        with parity = d % 2 (see PQMFSynthesis).  Chunk lengths are even in
        all shipped configs, so parity is constant across chunks.
        """
        T = x.shape[1]
        reps = (T + 3) // 2
        m = jnp.tile(jnp.asarray(self._mask2, x.dtype),
                     (reps, 1))[parity:parity + T]
        return x * m[None]

    @partial(jax.jit, static_argnums=0)
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 1) waveform -> (B, T/M, M) band signals."""
        if self.n_band == 1:
            return x
        B, T, _ = x.shape
        M, K = self.n_band, self.taps
        xp = x.reshape(B, T // M, M)                # phase components
        p = K // 2
        y = jax.lax.conv_general_dilated(
            xp, self._ana_kernel, window_strides=(1,),
            padding=[(p, p)], dimension_numbers=("NWC", "WIO", "NWC"))
        y = y[:, :-1]                                # reference drops last frame
        return self._apply_mask(y)

    @partial(jax.jit, static_argnums=0)
    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T/M, M) band signals -> (B, T, 1) waveform."""
        if self.n_band == 1:
            return x
        B, Tm, M = x.shape
        K = self.taps
        x = self._apply_mask(x)
        pad = K // 2 + 1
        y = jax.lax.conv_general_dilated(
            x, self._syn_kernel, window_strides=(1,),
            padding=[(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"))
        y = y[:, :-1] * M
        y = y[:, :, ::-1]                            # band flip (reference x.flip(1))
        wav = y.reshape(B, -1, 1)                    # interleave phases
        # alignment matches the reference CachedPQMF.inverse (pqmf.py:292-301),
        # the variant the shipped codec actually uses — verified sample-exact
        # in tests/test_parity_torch.py
        wav = wav[:, M:]
        return wav


@lru_cache(maxsize=8)
def get_pqmf(attenuation: float = 100, n_band: int = 16) -> PQMF:
    """Cached PQMF instances (filter design runs scipy.optimize once)."""
    return PQMF(attenuation, n_band)


# ---------------------------------------------------------------------------
# Flax PQMF modules (causal/streaming variants for the streamable codec)
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class PQMFAnalysis(nn.Module):
    """PQMF analysis as a flax module: centered (offline parity with the
    reference PQMF) or causal (streamable, reference CachedPQMF,
    pqmf.py:252-290).  Causal mode supports chunked streaming with an
    explicit left-context cache."""

    attenuation: float = 100
    n_band: int = 16
    causal: bool = False
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.streaming and not self.causal:
            raise ValueError(
                "streaming PQMF analysis requires causal=True: the centered "
                "path would zero-pad every chunk independently "
                "(stream != offline with no error otherwise)")
        if self.n_band == 1:
            return x
        pq = get_pqmf(self.attenuation, self.n_band)
        B, T, _ = x.shape
        M, K = pq.n_band, pq.taps
        xp = x.reshape(B, T // M, M)
        kern = jnp.asarray(pq._ana_kernel, x.dtype)
        if self.causal:
            pad = (K - 1, 0)
            if self.streaming:
                cache = self.variable(
                    "cache", "carry",
                    lambda: jnp.zeros((B, K - 1, M), x.dtype))
                xp_full = jnp.concatenate([cache.value, xp], axis=1)
                cache.value = xp_full[:, -(K - 1):]
                y = jax.lax.conv_general_dilated(
                    xp_full, kern, (1,), "VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"))
            else:
                y = jax.lax.conv_general_dilated(
                    xp, kern, (1,), [pad],
                    dimension_numbers=("NWC", "WIO", "NWC"))
        else:
            p = K // 2
            y = jax.lax.conv_general_dilated(
                xp, kern, (1,), [(p, p)],
                dimension_numbers=("NWC", "WIO", "NWC"))[:, :-1]
        if self.streaming:
            assert T // M % 2 == 0, "streaming PQMF needs even chunk frames"
        return pq._apply_mask(y)


class PQMFSynthesis(nn.Module):
    """PQMF synthesis (inverse) as a flax module; causal mode is streamable
    and skips the centered 2M-sample alignment trim (delay is metadata)."""

    attenuation: float = 100
    n_band: int = 16
    causal: bool = False
    streaming: bool = False
    parity: int = 0     # (upstream band-frame delay) % 2, streaming only

    @nn.compact
    def __call__(self, xb: jnp.ndarray) -> jnp.ndarray:
        if self.streaming and not self.causal:
            raise ValueError(
                "streaming PQMF synthesis requires causal=True (see "
                "PQMFAnalysis)")
        if self.n_band == 1:
            return xb
        pq = get_pqmf(self.attenuation, self.n_band)
        B, Tm, M = xb.shape
        K = pq.taps
        x = pq._apply_mask(xb, self.parity if self.streaming else 0)
        kern = jnp.asarray(pq._syn_kernel, xb.dtype)
        if self.causal:
            if self.streaming:
                cache = self.variable(
                    "cache", "carry",
                    lambda: jnp.zeros((B, K - 1, M), xb.dtype))
                x_full = jnp.concatenate([cache.value, x], axis=1)
                cache.value = x_full[:, -(K - 1):]
                y = jax.lax.conv_general_dilated(
                    x_full, kern, (1,), "VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"))
            else:
                y = jax.lax.conv_general_dilated(
                    x, kern, (1,), [(K - 1, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"))
            y = y * M
            y = y[:, :, ::-1]
            return y.reshape(B, -1, 1)
        pad = K // 2 + 1
        y = jax.lax.conv_general_dilated(
            x, kern, (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        y = y[:, :-1] * M
        y = y[:, :, ::-1]
        wav = y.reshape(B, -1, 1)
        # CachedPQMF.inverse alignment (see PQMF.inverse note)
        return wav[:, M:]
