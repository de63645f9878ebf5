"""Snake activations (periodic, for audio codecs).

Reference: /root/reference/after/autoencoder/core.py:201-260 (Snake and
SnakeBeta; the codec uses SnakeBeta, imported as `Snake` in
SimpleNetsStream.py:15).

snake_beta(x) = x + (1/beta) * sin(alpha * x)^2   with per-channel alpha/beta.

Layout is (B, T, C): alpha/beta broadcast over the trailing channel dim,
fusing into the surrounding convs under XLA.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class SnakeBeta(nn.Module):
    """Per-channel trainable snake-beta over (..., C).

    Calling with ``x=None`` returns the (transformed) ``(alpha, beta)``
    parameters instead of applying the activation — used by the fused
    Pallas snake+conv path (ops/pallas/fused_conv.py), which recomputes the
    activation inside the conv kernel."""

    dim: int
    alpha_logscale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray = None):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.dim,))
        beta = self.param("beta", init, (self.dim,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        if x is None:
            return alpha, beta
        return snake_beta(x, alpha, beta)


class Snake(nn.Module):
    """Plain snake: x + (1/alpha) sin^2(alpha x) (core.py:201)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (self.dim,))
        return x + jnp.square(jnp.sin(alpha * x)) / (alpha + 1e-9)
