"""End-to-end audio-to-audio transfer pipeline (offline inference).

This is the public inference API mirrored from the reference notebooks
(/root/reference/notebooks/audio_to_audio_demo.ipynb: ae_encode / timbre /
structure / sample / ae_decode) — but as one jit-compiled graph per entry
point: encode, timbre, structure, diffuse, decode, and the fused
`transfer = encode ∘ encoders ∘ sample ∘ decode`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import AfterConfig
from ..models import AudioCodec
from .rectified_flow import RectifiedFlow


class TransferPipeline:
    """Codec + diffusion stack for offline timbre transfer.

    variables = {"codec": ..., "diffusion": {"net"/"encoder"/...}}
    """

    def __init__(self, cfg: AfterConfig):
        self.cfg = cfg
        self.codec = AudioCodec(cfg.autoencoder)
        self.rf = RectifiedFlow(cfg)

    def init(self, rng: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        T = self.cfg.train.n_signal * self.cfg.autoencoder.ratio
        codec_vars = self.codec.init(k1, jnp.zeros((batch_size, T, 1)))
        diff_vars = self.rf.init(k2, batch_size)
        return {"codec": codec_vars, "diffusion": diff_vars}

    # -- codec entry points ------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def encode(self, variables, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 1) waveform -> (B, T/ratio, z) codec latents."""
        return self.codec.apply(variables["codec"], audio,
                                method=AudioCodec.encode)

    @partial(jax.jit, static_argnums=0)
    def decode(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        return self.codec.apply(variables["codec"], z,
                                method=AudioCodec.decode)

    # -- conditioning entry points ----------------------------------------

    @partial(jax.jit, static_argnums=0)
    def timbre(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        """Codec latents -> global timbre vector (B, zt)."""
        (zt, _, _), _ = self.rf.encode_timbre(variables["diffusion"], z)
        return zt

    @partial(jax.jit, static_argnums=0)
    def structure(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        """Codec latents -> per-frame structure codes (B, T, zs)."""
        (zs, _, _), _ = self.rf.encode_structure(variables["diffusion"], z)
        return zs

    # -- generation --------------------------------------------------------

    def diffuse(self, variables, x0, cond, time_cond, nb_steps: int = 20,
                guidance_timbre: float = 1.0, guidance_structure: float = 1.0):
        return self.rf.sample(variables["diffusion"]["net"], x0, cond,
                              time_cond, nb_steps, guidance_timbre,
                              guidance_structure)

    @partial(jax.jit, static_argnums=(0, 4))
    def transfer(self, variables, audio_structure: jnp.ndarray,
                 audio_timbre: jnp.ndarray, nb_steps: int = 20,
                 guidance_timbre: float = 1.0,
                 guidance_structure: float = 1.0,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Full audio-to-audio timbre transfer, one compiled graph.

        audio_structure supplies the time-varying content; audio_timbre the
        target timbre.  Mirrors notebook cell flow (encode both, encoders,
        20-step sample, decode).
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        z_struct = self.codec.apply(variables["codec"], audio_structure,
                                    method=AudioCodec.encode)
        z_timbre = self.codec.apply(variables["codec"], audio_timbre,
                                    method=AudioCodec.encode)
        (time_cond, _, _), _ = self.rf.encode_structure(
            variables["diffusion"], z_struct)
        (cond, _, _), _ = self.rf.encode_timbre(
            variables["diffusion"], z_timbre)
        x0 = jax.random.normal(rng, z_struct.shape)
        z_out = self.rf.sample(variables["diffusion"]["net"], x0, cond,
                               time_cond, nb_steps, guidance_timbre,
                               guidance_structure)
        return self.codec.apply(variables["codec"], z_out,
                                method=AudioCodec.decode)
