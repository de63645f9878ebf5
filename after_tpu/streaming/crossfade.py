"""Cross-fade streaming codec path for NON-causal codecs.

Reference: /root/reference/after_scripts/export_autoencoder.py:16-155,291-312
(AE_notcausal): the shipped base codec is trained with centered convs +
GroupNorm, so exact cached streaming is impossible; instead each buffer is
decoded with `n_fade` extra context latents and cross-faded into the
previous buffer's overlap tail, while GroupNorm streams its statistics over
a past-context pad buffer (CachedGroupNorm.stream bound True with
use_cached_conv False).  The encode side here uses a real audio context
window (the reference re-pads the non-causal encoder with cached convs —
same left-context idea).

State: {z_buffer (B, n_fade, z), out_buffer (B, n_fade*ratio, 1),
cache (streaming-GroupNorm pads, empty when use_norm=False)}.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..config import AutoEncoderConfig
from ..models import AudioCodec


@dataclasses.dataclass
class CrossfadeState:
    z_buffer: jnp.ndarray
    out_buffer: jnp.ndarray
    cache: Any


jax.tree_util.register_dataclass(CrossfadeState,
                                 data_fields=["z_buffer", "out_buffer",
                                              "cache"],
                                 meta_fields=[])


class CrossfadeDecoder:
    """Buffer-by-buffer encode/decode for a centered (non-causal) codec."""

    def __init__(self, cfg: AutoEncoderConfig, n_fade: int = 4,
                 chunk_size: int = 8):
        assert not cfg.causal, \
            "use the cached-conv streaming path for causal codecs"
        self.cfg = cfg
        self.n_fade = n_fade
        self.chunk_size = chunk_size
        # "norm" sentinel: GroupNorm streams its stats, convs stay offline
        self.codec = AudioCodec(cfg,
                                streaming="norm" if cfg.use_norm else False)

    def _window_cache(self, variables, x, method):
        """Materialize the streaming-GroupNorm pads for a fixed window shape
        (zero input -> zero pads, the reference's initial buffer state)."""
        _, aux = self.codec.apply(variables, x, method=method,
                                  mutable=["cache"])
        return aux.get("cache", {})

    def init_state(self, variables, batch_size: int = 1) -> CrossfadeState:
        r = self.cfg.ratio
        z0 = jnp.zeros((batch_size, self.n_fade + self.chunk_size,
                        self.cfg.z_channels))
        return CrossfadeState(
            z_buffer=jnp.zeros((batch_size, self.n_fade,
                                self.cfg.z_channels)),
            out_buffer=jnp.zeros((batch_size, self.n_fade * r, 1)),
            cache=self._window_cache(variables, z0, AudioCodec.decode))

    @partial(jax.jit, static_argnums=0)
    def decode(self, variables, state: CrossfadeState, z: jnp.ndarray
               ) -> Tuple[jnp.ndarray, CrossfadeState]:
        """(B, chunk, z) latents -> (B, chunk*ratio, 1) audio."""
        r = self.cfg.ratio
        nf = self.n_fade
        z_full = jnp.concatenate([state.z_buffer, z], axis=1)
        x, aux = self.codec.apply({**variables, "cache": state.cache},
                                  z_full, method=AudioCodec.decode,
                                  mutable=["cache"])
        # the decoded length may differ from len(z_full)*r by the PQMF
        # alignment offset; right-pad to the nominal length
        want = z_full.shape[1] * r
        if x.shape[1] < want:
            x = jnp.pad(x, ((0, 0), (0, want - x.shape[1]), (0, 0)))
        x = x[:, :want]

        alpha = jnp.linspace(0.0, 1.0, nf * r)[None, :, None]
        head = (1 - alpha) * state.out_buffer + alpha * x[:, :nf * r]
        x = jnp.concatenate([head, x[:, nf * r:]], axis=1)

        new_state = CrossfadeState(
            z_buffer=z_full[:, -nf:],
            out_buffer=x[:, -nf * r:],
            cache=aux.get("cache", {}))
        return x[:, :-nf * r], new_state

    def init_encode_state(self, variables, batch_size: int = 1
                          ) -> Tuple[jnp.ndarray, Any]:
        """(audio context ring of the last n_fade*ratio input samples,
        streaming-GroupNorm pads)."""
        r = self.cfg.ratio
        ctx = jnp.zeros((batch_size, self.n_fade * r, 1))
        x0 = jnp.zeros((batch_size, (self.n_fade + self.chunk_size) * r, 1))
        return ctx, self._window_cache(variables, x0, AudioCodec.encode)

    @partial(jax.jit, static_argnums=0)
    def encode(self, variables, state: Tuple[jnp.ndarray, Any],
               x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, Any]]:
        """(B, chunk*ratio, 1) audio -> (B, chunk, z) latents for a
        non-causal encoder: each buffer is encoded together with the
        previous n_fade*ratio samples of real audio context."""
        ctx, cache = state
        full = jnp.concatenate([ctx, x], axis=1)
        z, aux = self.codec.apply({**variables, "cache": cache}, full,
                                  method=AudioCodec.encode,
                                  mutable=["cache"])
        t = x.shape[1] // self.cfg.ratio
        new_ctx = full[:, -self.n_fade * self.cfg.ratio:]
        return z[:, -t:], (new_ctx, aux.get("cache", {}))
