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
from ..utils.precision import cast_floating, resolve_dtype
from .factory import make_model


class TransferPipeline:
    """Codec + diffusion stack for offline timbre transfer.

    variables = {"codec": ..., "diffusion": {"net"/"encoder"/...}}
    """

    def __init__(self, cfg: AfterConfig, compute_dtype=None):
        """compute_dtype: e.g. jnp.bfloat16 runs codec + denoiser compute at
        that precision (params stored f32; Euler state and conditioning
        encoders stay f32; output audio is f32)."""
        self.cfg = cfg
        self.compute_dtype = resolve_dtype(compute_dtype)
        self.codec = AudioCodec(cfg.autoencoder)
        self.rf = make_model(cfg)

    def prepare_variables(self, variables):
        """One-time host-side cast to the compute dtype; the in-graph casts
        then fold to no-ops (and HBM holds the params at half size)."""
        if self.compute_dtype is None:
            return variables
        return cast_floating(variables, self.compute_dtype)

    def _codec_apply(self, variables, x, method):
        cd = self.compute_dtype
        if cd is None:
            return self.codec.apply(variables["codec"], x, method=method)
        out = self.codec.apply(
            cast_floating(variables["codec"], cd), x.astype(cd),
            method=method)
        return out.astype(jnp.float32)

    def _encode_cond(self, variables, z, which: str):
        """Run the timbre/structure encoder at the compute dtype."""
        cd = self.compute_dtype
        dv = variables["diffusion"]
        if cd is not None:
            dv = cast_floating(dv, cd)   # unused subtrees are DCE'd by XLA
            z = z.astype(cd)
        fn = (self.rf.encode_timbre if which == "timbre"
              else self.rf.encode_structure)
        (out, _, _), _ = fn(dv, z)
        return out.astype(jnp.float32)

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
        return self._codec_apply(variables, audio, AudioCodec.encode)

    @partial(jax.jit, static_argnums=0)
    def decode(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        return self._codec_apply(variables, z, AudioCodec.decode)

    # -- conditioning entry points ----------------------------------------

    @partial(jax.jit, static_argnums=0)
    def timbre(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        """Codec latents -> global timbre vector (B, zt)."""
        return self._encode_cond(variables, z, "timbre")

    @partial(jax.jit, static_argnums=0)
    def structure(self, variables, z: jnp.ndarray) -> jnp.ndarray:
        """Codec latents -> per-frame structure codes (B, T, zs)."""
        return self._encode_cond(variables, z, "structure")

    # -- generation --------------------------------------------------------

    def diffuse(self, variables, x0, cond, time_cond, nb_steps: int = 20,
                guidance_timbre: float = 1.0, guidance_structure: float = 1.0):
        return self.rf.sample(variables["diffusion"]["net"], x0, cond,
                              time_cond, nb_steps, guidance_timbre,
                              guidance_structure,
                              compute_dtype=self.compute_dtype)

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
        # NB: batching the two encodes into one batch-2 call measured
        # SLOWER on v5e (17 -> 18.5 ms/transfer: the concat copy costs more
        # than the MXU gains at T=524288) — keep the two separate encodes.
        z_struct = self._codec_apply(variables, audio_structure,
                                     AudioCodec.encode)
        z_timbre = self._codec_apply(variables, audio_timbre,
                                     AudioCodec.encode)
        time_cond = self._encode_cond(variables, z_struct, "structure")
        cond = self._encode_cond(variables, z_timbre, "timbre")
        x0 = jax.random.normal(rng, z_struct.shape)
        z_out = self.rf.sample(variables["diffusion"]["net"], x0, cond,
                               time_cond, nb_steps, guidance_timbre,
                               guidance_structure,
                               compute_dtype=self.compute_dtype)
        return self._codec_apply(variables, z_out, AudioCodec.decode)
