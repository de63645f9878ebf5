"""Real-time streaming graph — the TPU replacement for the nn_tilde Streamer.

Reference: /root/reference/after_scripts/export.py:145-518 (Streamer): the
exported TorchScript module holding codec+encoder+denoiser state in
registered buffers, called buffer-by-buffer from the nn~ C++ audio thread.

Here every method is a pure jitted step `(variables, state, x) -> (y, state)`
over an explicit :class:`StreamState` pytree:

    forward    audio chunk x2 (structure, timbre)  -> audio chunk
    structure  audio chunk -> per-frame structure codes
    timbre     audio chunk -> timbre vector (ring-buffered context window)
    diffuse    (structure codes, timbre vec) -> codec latents (KV-cached)
    decode     codec latents -> audio chunk

State covers: codec conv caches (separate encode states for the structure and
timbre streams — reference loads the codec twice, export.py:159-168), codec
decoder caches, structure-encoder conv caches, per-diffusion-step denoiser KV
caches (batch 3B for the CFG triple), and the timbre ring buffer
(export.py:208-212 previous_timbre).

Causal codecs stream exactly through cached convs.  NON-causal codecs (the
reference's shipped base codec) stream through the crossfade path the
reference uses for them (export_autoencoder.py:131-153 AE_notcausal, loaded
as the Streamer's emb_model in export.py:159-168): context-window encode +
overlap cross-faded decode, so `decode`/`forward` output lags by
``n_fade`` latent frames (``Streamer.decode_lag_samples``, recorded in the
export manifest for hosts to compensate).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import AfterConfig
from ..models import AudioCodec, ECAPAEncoder, Encoder1D
from ..diffusion.factory import make_model
from ..utils.precision import cast_floating, resolve_dtype
from .state import init_stream_state, zero_cache


@dataclasses.dataclass
class StreamState:
    codec_struct: Any      # codec encoder caches, structure stream
    codec_timbre: Any      # codec encoder caches, timbre stream
    codec_dec: Any         # codec decoder caches
    enc_time: Any          # structure-encoder conv caches
    denoiser: Any          # per-step KV caches (batch 3B)
    prev_timbre: jnp.ndarray   # (B, n_signal_timbre, z) latent ring buffer


jax.tree_util.register_dataclass(
    StreamState,
    data_fields=["codec_struct", "codec_timbre", "codec_dec", "enc_time",
                 "denoiser", "prev_timbre"],
    meta_fields=[])


class Streamer:

    def __init__(self, cfg: AfterConfig, chunk_size: int = 4,
                 latent_range: float = 1.0, compute_dtype=None,
                 n_fade: int = 4):
        """compute_dtype: e.g. jnp.bfloat16 runs the per-buffer compute at
        that precision (conv/KV caches included); audio/latent I/O stays
        f32.  Call `prepare_variables` once so the per-call param casts
        fold away.  n_fade: crossfade overlap in latent frames for
        non-causal codecs (ignored for causal ones)."""
        if cfg.denoiser.arch == "unet1d":
            raise ValueError(
                "denoiser arch 'unet1d' is offline-only (no streaming "
                "caches) — use TransferPipeline, or arch 'v2'/'v1'")
        self.cfg = cfg
        self.compute_dtype = resolve_dtype(compute_dtype)
        self.chunk_size = chunk_size
        self.latent_range = latent_range
        self.ratio = cfg.autoencoder.ratio
        self.audio_chunk = chunk_size * self.ratio
        self.n_signal_timbre = cfg.train.n_signal
        # polyphony of the MIDI note-pair surface (reference
        # export_midi.py:31 default n_poly=8)
        self.n_poly = 8
        # single MIDI-ness predicate shared by method_specs and the
        # exporter (an audio model that happens to use zs_channels=128
        # must not grow a bogus diffuse_midi surface)
        self.is_midi = cfg.structure_type == "midi"
        if self.is_midi and cfg.zs_channels != 128:
            raise ValueError(
                "midi models use the 128-bin piano roll as structure "
                f"(zs_channels=128); config has {cfg.zs_channels}")

        if cfg.autoencoder.causal:
            self.crossfade = None
            self.codec = AudioCodec(cfg.autoencoder, streaming=True)
        else:
            # the reference streams its shipped NON-causal codec via the
            # crossfade TS export loaded as the Streamer's emb_model
            # (export.py:159-168 + export_autoencoder.py AE_notcausal)
            from .crossfade import CrossfadeDecoder
            self.crossfade = CrossfadeDecoder(cfg.autoencoder,
                                              n_fade=n_fade,
                                              chunk_size=chunk_size)
            self.codec = self.crossfade.codec
        self.rf = make_model(cfg)
        self.enc_time = (Encoder1D(cfg.encoder_time, streaming=True)
                         if cfg.encoder_time is not None else None)
        self.encoder = ECAPAEncoder(cfg.encoder)

    # ------------------------------------------------------------------

    def _cd(self, tree):
        """Cast params/inputs to the compute dtype (no-op when unset or when
        `prepare_variables` already cast them)."""
        return (tree if self.compute_dtype is None
                else cast_floating(tree, self.compute_dtype))

    def prepare_variables(self, variables):
        """One-time host-side cast of the variables to the compute dtype so
        the in-graph casts in each step function become no-ops."""
        return self._cd(variables)

    def init_state(self, variables, batch_size: int = 1) -> StreamState:
        """Zeroed stream state for `batch_size` parallel voices."""
        cfg = self.cfg
        B, A = batch_size, self.audio_chunk
        z_ch = cfg.autoencoder.z_channels
        T = self.chunk_size

        if self.crossfade is not None:
            cv = variables["codec"]
            enc_cache = self.crossfade.init_encode_state(cv, B)
            dec_cache = self.crossfade.init_state(cv, B)
        else:
            enc_cache = init_stream_state(self.codec, jnp.zeros((B, A, 1)),
                                          method=AudioCodec.encode)
            dec_cache = init_stream_state(self.codec,
                                          jnp.zeros((B, T, z_ch)),
                                          method=AudioCodec.decode)
        et_cache = (init_stream_state(self.enc_time,
                                      jnp.zeros((B, T, z_ch)))
                    if self.enc_time is not None else {})
        dn_cache = jax.jit(lambda: zero_cache(self.rf.net_stream.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((3 * B, T, z_ch)), jnp.zeros((3 * B,)),
            jnp.zeros((3 * B, cfg.zt_channels)),
            jnp.zeros((3 * B, T, cfg.zs_channels)))["cache"]))()
        state = StreamState(
            codec_struct=enc_cache,
            codec_timbre=jax.tree_util.tree_map(jnp.copy, enc_cache),
            codec_dec=dec_cache,
            enc_time=et_cache,
            denoiser=dn_cache,
            prev_timbre=jnp.zeros((B, self.n_signal_timbre, z_ch)))
        # caches ride through the compute-dtype graph, so they live at that
        # dtype (conv ring buffers, KV caches, the timbre latent ring)
        return self._cd(state)

    # ------------------------------------------------------------------
    # step functions (each jitted once)
    # ------------------------------------------------------------------

    def _codec_encode(self, variables, cache, audio):
        if self.crossfade is not None:
            return self.crossfade.encode(self._cd(variables["codec"]),
                                         cache, self._cd(audio))
        z, aux = self.codec.apply(
            {**self._cd(variables["codec"]), "cache": cache},
            self._cd(audio), method=AudioCodec.encode, mutable=["cache"])
        return z, aux["cache"]

    @partial(jax.jit, static_argnums=0)
    def structure(self, variables, state: StreamState, audio: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, StreamState]:
        """(B, chunk*ratio, 1) audio -> (B, chunk, zs) structure codes
        (export.py:432-436)."""
        z, enc_cache = self._codec_encode(variables, state.codec_struct, audio)
        if self.enc_time is not None:
            zs, aux = self.enc_time.apply(
                {**self._cd(variables["diffusion"]["encoder_time"]),
                 "cache": state.enc_time}, z, mutable=["cache"])
            zs = zs[0]
            et_cache = aux["cache"]
        else:
            zs, et_cache = z, state.enc_time
        return (zs.astype(jnp.float32),
                dataclasses.replace(state, codec_struct=enc_cache,
                                    enc_time=et_cache))

    @partial(jax.jit, static_argnums=0)
    def timbre(self, variables, state: StreamState, audio: jnp.ndarray
               ) -> Tuple[jnp.ndarray, StreamState]:
        """(B, chunk*ratio, 1) audio -> (B, zt) timbre vector via the latent
        ring buffer (export.py:419-430)."""
        z, enc_cache = self._codec_encode(variables, state.codec_timbre, audio)
        ring = jnp.concatenate([state.prev_timbre, z], axis=1)[:, z.shape[1]:]
        zt, _, _ = self.encoder.apply(
            self._cd(variables["diffusion"]["encoder"]), ring)
        zt = zt.astype(jnp.float32) / self.latent_range
        return zt, dataclasses.replace(state, codec_timbre=enc_cache,
                                       prev_timbre=ring)

    @partial(jax.jit, static_argnums=0)
    def diffuse(self, variables, state: StreamState, time_cond: jnp.ndarray,
                zsem: jnp.ndarray, nb_steps: int = 1,
                guidance_timbre: float = 1.0, guidance_structure: float = 1.0,
                rng: Optional[jax.Array] = None
                ) -> Tuple[jnp.ndarray, StreamState]:
        """(B, chunk, zs) structure + (B, zt) timbre -> (B, chunk, latents)
        denoised codec latents (export.py:438-460)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        zsem = zsem * self.latent_range
        B, T = time_cond.shape[0], time_cond.shape[1]
        x0 = jax.random.normal(rng, (B, T, self.cfg.denoiser.n_channels))
        x, dn_cache = self.rf.sample_stream(
            variables["diffusion"]["net"], state.denoiser, x0, zsem,
            time_cond, nb_steps, guidance_timbre, guidance_structure,
            compute_dtype=self.compute_dtype)
        return x, dataclasses.replace(state, denoiser=dn_cache)

    @partial(jax.jit, static_argnums=0)
    def decode(self, variables, state: StreamState, z: jnp.ndarray
               ) -> Tuple[jnp.ndarray, StreamState]:
        if self.crossfade is not None:
            y, cf = self.crossfade.decode(self._cd(variables["codec"]),
                                          state.codec_dec, self._cd(z))
            return (y.astype(jnp.float32),
                    dataclasses.replace(state, codec_dec=cf))
        y, aux = self.codec.apply(
            {**self._cd(variables["codec"]), "cache": state.codec_dec},
            self._cd(z), method=AudioCodec.decode, mutable=["cache"])
        return (y.astype(jnp.float32),
                dataclasses.replace(state, codec_dec=aux["cache"]))

    @property
    def decode_lag_frames(self) -> int:
        """Latent frames the streamed decode lags behind its input
        (crossfade overlap; 0 for causal codecs, whose residual lag is the
        sample-level transpose-conv delay below)."""
        return self.crossfade.n_fade if self.crossfade is not None else 0

    @property
    def decode_lag_samples(self) -> int:
        """Total decode latency in samples a host should compensate."""
        from ..models.autoencoder import decoder_band_delay
        cfg = self.cfg.autoencoder
        if self.crossfade is not None:
            return self.crossfade.n_fade * cfg.ratio
        return decoder_band_delay(cfg) * cfg.pqmf_bands

    def forward(self, variables, state: StreamState,
                audio_structure: jnp.ndarray, audio_timbre: jnp.ndarray,
                nb_steps: int = 1, guidance_timbre: float = 1.0,
                guidance_structure: float = 1.0,
                rng: Optional[jax.Array] = None
                ) -> Tuple[jnp.ndarray, StreamState]:
        """Full audio->audio streaming step (export.py:486-493), fused into a
        single compiled graph per buffer (one dispatch per audio callback —
        the reference crosses C++<->TorchScript once per buffer too, but runs
        a Python-level op graph inside)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._forward_jit(variables, state, audio_structure,
                                 audio_timbre, nb_steps, guidance_timbre,
                                 guidance_structure, rng)

    @partial(jax.jit, static_argnums=0, donate_argnums=(2,))
    def _forward_jit(self, variables, state, audio_structure, audio_timbre,
                     nb_steps, guidance_timbre, guidance_structure, rng):
        # `state` is donated: the stream state buffers are updated in place
        # on device each audio callback (no per-buffer copies of the KV/conv
        # caches)
        zs, state = self.structure(variables, state, audio_structure)
        zt, state = self.timbre(variables, state, audio_timbre)
        z, state = self.diffuse(variables, state, zs, zt, nb_steps,
                                guidance_timbre, guidance_structure, rng=rng)
        audio, state = self.decode(variables, state, z)
        return audio, state

    @partial(jax.jit, static_argnums=0)
    def generate(self, variables, state: StreamState, time_cond, zsem,
                 nb_steps: int = 1, guidance_timbre: float = 1.0,
                 guidance_structure: float = 1.0,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, StreamState]:
        """(structure codes, timbre vector) -> audio: diffuse + decode in one
        graph (reference `generate`, export.py:475-478)."""
        z, state = self.diffuse(variables, state, time_cond, zsem, nb_steps,
                                guidance_timbre, guidance_structure, rng=rng)
        return self.decode(variables, state, z)

    @partial(jax.jit, static_argnums=0)
    def generate_timbre(self, variables, state: StreamState, audio, zsem,
                        nb_steps: int = 1, guidance_timbre: float = 1.0,
                        guidance_structure: float = 1.0,
                        rng: Optional[jax.Array] = None
                        ) -> Tuple[jnp.ndarray, StreamState]:
        """(structure audio, timbre vector) -> audio: encode structure from
        the audio, diffuse with the given timbre, decode (reference
        `generate_timbre` via diffuse_timbre, export.py:452-467, 481-484)."""
        zs, state = self.structure(variables, state, audio)
        z, state = self.diffuse(variables, state, zs, zsem, nb_steps,
                                guidance_timbre, guidance_structure, rng=rng)
        return self.decode(variables, state, z)

    # -- XY-pad projector (reference latent2map/map2latent,
    #    export.py:496-507; trained via utils/latent_map.py) --------------

    @partial(jax.jit, static_argnums=0)
    def latent2map(self, projector_params, zt: jnp.ndarray) -> jnp.ndarray:
        """(B, zt) timbre vector -> (B, 2) map coordinates."""
        from ..utils.latent_map import SmallAutoencoder
        model = SmallAutoencoder(in_dim=self.cfg.zt_channels)
        return model.apply(projector_params, zt * self.latent_range,
                           method=SmallAutoencoder.encode)

    @partial(jax.jit, static_argnums=0)
    def map2latent(self, projector_params, xy: jnp.ndarray) -> jnp.ndarray:
        """(B, 2) map coordinates -> (B, zt) timbre vector."""
        from ..utils.latent_map import SmallAutoencoder
        model = SmallAutoencoder(in_dim=self.cfg.zt_channels)
        zt = model.apply(projector_params, xy,
                         method=SmallAutoencoder.decode)
        return zt / self.latent_range

    # -- MIDI-to-audio streaming (reference export_midi.py:150-476) -------

    @partial(jax.jit, static_argnums=0)
    def diffuse_midi(self, variables, state: StreamState,
                     notes: jnp.ndarray, zsem: jnp.ndarray,
                     nb_steps: int = 1, guidance_timbre: float = 1.0,
                     guidance_structure: float = 1.0,
                     rng: Optional[jax.Array] = None
                     ) -> Tuple[jnp.ndarray, StreamState]:
        """Polyphonic MIDI streaming step: `notes` is (B, chunk, n_poly, 2)
        [(pitch, velocity) pairs per frame]; builds the 128-bin piano roll
        (export_midi.py:401-417) and denoises with it as structure."""
        B, T, n_poly, _ = notes.shape
        pitch = jnp.clip(notes[..., 0].astype(jnp.int32), 0, 127)
        # /128 matches the reference's streaming roll (export_midi.py:416;
        # the offline training collate uses /127 per diffusion/utils.py:102)
        vel = notes[..., 1] / 128.0
        roll = jnp.zeros((B, T, 128))
        roll = roll.at[
            jnp.arange(B)[:, None, None],
            jnp.arange(T)[None, :, None],
            pitch].max(vel)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self.diffuse(variables, state, roll, zsem, nb_steps,
                            guidance_timbre, guidance_structure, rng=rng)

    # ------------------------------------------------------------------

    def method_specs(self) -> Dict[str, Dict]:
        """I/O metadata for host integration — the equivalent of nn_tilde's
        register_method channel/ratio declarations (export.py:190-328)."""
        cfg = self.cfg
        r = self.ratio
        # midi models have no audio-structure encoder: `structure` emits raw
        # codec latents and the audio-structure generate_timbre path is
        # invalid (reference export_midi has neither)
        midi = self.is_midi
        # diffusing methods take the live-settable attribute scalars
        # (nb_steps, guidances) as trailing runtime inputs when exported —
        # the nn~ attribute registration equivalent (export.py:180-182)
        attrs = ("nb_steps", "guidance_timbre", "guidance_structure")
        specs = {
            "forward": dict(in_channels=2, in_ratio=1, out_channels=1,
                            out_ratio=1, attributes=attrs),
            "structure": dict(in_channels=1, in_ratio=1,
                              out_channels=(cfg.autoencoder.z_channels
                                            if midi else cfg.zs_channels),
                              out_ratio=r),
            "timbre": dict(in_channels=1, in_ratio=1,
                           out_channels=cfg.zt_channels, out_ratio=r),
            "diffuse": dict(in_channels=cfg.zs_channels + cfg.zt_channels,
                            in_ratio=r,
                            out_channels=cfg.denoiser.n_channels,
                            out_ratio=r, attributes=attrs),
            "decode": dict(in_channels=cfg.denoiser.n_channels, in_ratio=r,
                           out_channels=1, out_ratio=1),
            "generate": dict(in_channels=cfg.zs_channels + cfg.zt_channels,
                             in_ratio=r, out_channels=1, out_ratio=1,
                             attributes=attrs),
            "generate_timbre": dict(in_channels=1 + cfg.zt_channels,
                                    in_ratio=1, out_channels=1, out_ratio=1,
                                    attributes=attrs),
            "latent2map": dict(in_channels=cfg.zt_channels, in_ratio=1,
                               out_channels=2, out_ratio=1, stateless=True),
            "map2latent": dict(in_channels=2, in_ratio=1,
                               out_channels=cfg.zt_channels, out_ratio=1,
                               stateless=True),
            **({"diffuse_midi": dict(
                in_channels=2 * self.n_poly + cfg.zt_channels, in_ratio=r,
                out_channels=cfg.denoiser.n_channels, out_ratio=r,
                attributes=attrs)}
               if midi else {}),
        }
        if midi:
            del specs["generate_timbre"]
            del specs["forward"]
        return specs
