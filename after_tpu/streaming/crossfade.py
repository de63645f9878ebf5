"""Cross-fade streaming decode for NON-causal codecs.

Reference: /root/reference/after_scripts/export_autoencoder.py:16-155
(AE_notcausal): the shipped base codec is trained with centered convs +
GroupNorm, so exact cached streaming is impossible; instead each buffer is
decoded with `n_fade` extra context latents and cross-faded into the
previous buffer's overlap tail.

State: {z_buffer (B, n_fade, z), out_buffer (B, n_fade*ratio, 1)}.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import AutoEncoderConfig
from ..models import AudioCodec


@dataclasses.dataclass
class CrossfadeState:
    z_buffer: jnp.ndarray
    out_buffer: jnp.ndarray


jax.tree_util.register_dataclass(CrossfadeState,
                                 data_fields=["z_buffer", "out_buffer"],
                                 meta_fields=[])


class CrossfadeDecoder:
    """Buffer-by-buffer decode for a centered (non-causal) codec."""

    def __init__(self, cfg: AutoEncoderConfig, n_fade: int = 4):
        assert not cfg.causal, "use the cached-conv streaming path for causal codecs"
        self.cfg = cfg
        self.n_fade = n_fade
        self.codec = AudioCodec(cfg)

    def init_state(self, batch_size: int = 1) -> CrossfadeState:
        r = self.cfg.ratio
        return CrossfadeState(
            z_buffer=jnp.zeros((batch_size, self.n_fade,
                                self.cfg.z_channels)),
            out_buffer=jnp.zeros((batch_size, self.n_fade * r, 1)))

    @partial(jax.jit, static_argnums=0)
    def decode(self, variables, state: CrossfadeState, z: jnp.ndarray
               ) -> Tuple[jnp.ndarray, CrossfadeState]:
        """(B, chunk, z) latents -> (B, chunk*ratio, 1) audio."""
        r = self.cfg.ratio
        nf = self.n_fade
        z_full = jnp.concatenate([state.z_buffer, z], axis=1)
        x = self.codec.apply(variables, z_full, method=AudioCodec.decode)
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
            out_buffer=x[:, -nf * r:])
        return x[:, :-nf * r], new_state
