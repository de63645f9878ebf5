"""Finite Scalar Quantization (FSQ) bottleneck.

Reference: /root/reference/after/diffusion/networks/fsq.py:66 (FSQ with
noise-dropout quantization :165-186), after "Finite Scalar Quantization:
VQ-VAE Made Simple" (https://arxiv.org/abs/2309.15505).

Quantizes each channel to a small set of `levels` via bounded rounding with a
straight-through estimator; `noise_dropout` randomly replaces the quantized
value with (bounded input + uniform noise) per element, as in the reference.
Available to Encoder1D as `vector_quantizer` (encoder.py:129,289-290).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class FSQ:

    def __init__(self, levels: Sequence[int], noise_dropout: float = 0.0):
        self.levels = np.asarray(levels, dtype=np.int32)
        self.noise_dropout = noise_dropout
        self.dim = len(levels)
        basis = np.concatenate([[1], np.cumprod(self.levels[:-1])])
        self._basis = jnp.asarray(basis, jnp.int32)
        self.codebook_size = int(np.prod(self.levels))

    def _bound(self, z: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
        """Tanh-bound each channel into its quantization range."""
        levels = jnp.asarray(self.levels, z.dtype)
        half_l = (levels - 1) * (1 - eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z: jnp.ndarray,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """(..., dim) -> (..., dim) quantized (normalised to [-1, 1]),
        straight-through gradients.

        With `rng` and noise_dropout > 0, matches the reference's two-stage
        per-SAMPLE dropout (fsq.py:160-186): one Bernoulli mask per sample
        substitutes the raw unquantized z, a second substitutes
        z + U(-0.5, 0.5)/half_width.
        """
        bounded = self._bound(z)
        half_width = jnp.asarray(self.levels, z.dtype) // 2
        rounded = jnp.round(bounded)
        quantized = (bounded
                     + jax.lax.stop_gradient(rounded - bounded)) / half_width
        if rng is not None and self.noise_dropout > 0:
            k1, k2, k3 = jax.random.split(rng, 3)
            mshape = (z.shape[0],) + (1,) * (z.ndim - 1)
            qmask = jax.random.uniform(k1, mshape) < self.noise_dropout
            quantized = jnp.where(qmask, z, quantized)
            omask = jax.random.uniform(k2, mshape) < self.noise_dropout
            offset = (jax.random.uniform(k3, z.shape) - 0.5) / half_width
            quantized = jnp.where(omask, z + offset, quantized)
        return quantized

    def codes_to_indices(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Quantized (normalised) codes -> integer codebook indices."""
        half_width = jnp.asarray(self.levels, codes.dtype) // 2
        zhat = codes * half_width + half_width
        # round before the int cast: the f32 round trip can land at
        # 5.9999995 for exact codes, which truncation would corrupt
        return jnp.sum(jnp.round(zhat).astype(jnp.int32) * self._basis,
                       axis=-1)

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        half_width = jnp.asarray(self.levels, jnp.float32) // 2
        codes = jnp.mod(indices[..., None] // self._basis,
                        jnp.asarray(self.levels))
        return (codes - half_width) / half_width
