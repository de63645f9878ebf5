"""Rectified-flow timbre-transfer model: velocity field, 3-way CFG, and a
lax.scan-fused Euler sampler (offline and streaming).

Reference: /root/reference/after/diffusion/model.py:570-785 (RectifiedFlow)
and after_scripts/export.py:357-416 (streaming sampler with per-step KV
caches).  TPU redesign:

- the Python Euler loop becomes one `lax.scan` over diffusion steps, so the
  whole k-step sampler is a single compiled graph;
- the 3-way CFG (full / structure-only / unconditional) stays a single
  batched forward of 3B rows (model.py:730-751) — MXU-friendly;
- the streaming sampler threads the denoiser KV-cache pytree through the scan
  carry; each scan iteration i reads/writes cache slot i, replacing the
  mutable `roll_cache` buffers (transformerv2.py:171-188).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import AfterConfig
from ..models import ECAPAEncoder, Encoder1D, make_denoiser
from ..utils.precision import cast_floating


class RectifiedFlow:
    """Bundle of sub-models + pure functions for training and inference.

    Parameters live in one pytree:
        variables = {
          "net":          {"params": ...},
          "encoder":      {"params": ..., "batch_stats": ...},
          "encoder_time": {"params": ..., "batch_stats": ...},   (optional)
          "classifier":   {"params": ..., "batch_stats": ...},   (optional)
        }
    """

    def __init__(self, cfg: AfterConfig):
        self.cfg = cfg
        # gin-selectable backbone slot (base.gin net=@DenoiserV2; v1/unet1d
        # alternatives) — net_stream is None for offline-only backbones.
        self.net = make_denoiser(cfg.denoiser)
        self.net_stream = make_denoiser(cfg.denoiser, streaming=True)
        self.encoder = ECAPAEncoder(cfg.encoder)
        self.encoder_time = (Encoder1D(cfg.encoder_time)
                             if cfg.encoder_time is not None else None)
        self.classifier = (Encoder1D(cfg.classifier)
                           if cfg.classifier is not None else None)
        self.drop_value = cfg.drop_value

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init(self, rng: jax.Array, batch_size: int = 2) -> Dict[str, Any]:
        cfg = self.cfg
        T = cfg.train.n_signal
        C = cfg.denoiser.n_channels
        keys = jax.random.split(rng, 4)
        x = jnp.zeros((batch_size, T, C))
        t = jnp.zeros((batch_size,))
        cond = jnp.zeros((batch_size, cfg.zt_channels))
        tcond = jnp.zeros((batch_size, T, cfg.zs_channels))

        variables = {"net": self.net.init(keys[0], x, t, cond, tcond)}
        variables["encoder"] = self.encoder.init(keys[1], x)
        if self.encoder_time is not None:
            variables["encoder_time"] = self.encoder_time.init(keys[2], x)
        if self.classifier is not None:
            variables["classifier"] = self.classifier.init(
                keys[3], jnp.zeros((batch_size, T, cfg.zs_channels)))
        return variables

    # ------------------------------------------------------------------
    # encoders
    # ------------------------------------------------------------------

    def encode_timbre(self, variables, x, training: bool = False,
                      rng: Optional[jax.Array] = None):
        """x (B, T, C latents) -> (z, mean, reg); updates batch_stats if training."""
        if training:
            (z, mean, reg), updates = self.encoder.apply(
                variables["encoder"], x, training=True, rng=rng,
                mutable=["batch_stats"])
            return (z, mean, reg), updates
        z, mean, reg = self.encoder.apply(variables["encoder"], x)
        return (z, mean, reg), {}

    def encode_structure(self, variables, x, training: bool = False,
                         rng: Optional[jax.Array] = None):
        if self.encoder_time is None:
            return (x, x, jnp.asarray(0.0)), {}
        if training:
            (z, mean, reg), updates = self.encoder_time.apply(
                variables["encoder_time"], x, training=True, rng=rng,
                mutable=["batch_stats"])
            return (z, mean, reg), updates
        z, mean, reg = self.encoder_time.apply(variables["encoder_time"], x)
        return (z, mean, reg), {}

    # ------------------------------------------------------------------
    # CFG utilities
    # ------------------------------------------------------------------

    def cfgdrop(self, rng: jax.Array, datas, drop_targets,
                drop_rate: float):
        """Condition dropout for CFG training (model.py:73-97).

        A single uniform draw per sample gates joint dropping of all
        conditions plus per-condition windows for the targets.
        """
        bsize = datas[0].shape[0]
        draw = jax.random.uniform(rng, (bsize,))
        drop_all = draw < drop_rate
        out = []
        for i, d in enumerate(datas):
            if d is None:
                out.append(None)
                continue
            drop_i = (draw > drop_rate * (i + 1)) & (draw < drop_rate * (i + 2))
            drop = (drop_all | drop_i) if i in tuple(drop_targets) else drop_all
            shape = (bsize,) + (1,) * (d.ndim - 1)
            out.append(jnp.where(drop.reshape(shape), self.drop_value, d))
        return out

    # ------------------------------------------------------------------
    # training losses
    # ------------------------------------------------------------------

    def diffusion_loss(self, net_params, rng, x1, time_cond, cond,
                       training: bool = True, compute_dtype=None):
        """Rectified-flow MSE on the velocity field (model.py:702-719).

        With `compute_dtype` (mixed-precision training) the denoiser forward
        runs at that dtype; noise, interpolant, target and the MSE stay f32
        (the returned interpolant is f32 for the cycle step).  The caller
        is expected to pass `net_params` already cast to the compute dtype
        (the trainer's vars_of does) — only the inputs are cast here."""
        k_noise, k_t, k_drop = jax.random.split(rng, 3)
        x0 = jax.random.normal(k_noise, x1.shape)
        target = x1 - x0
        t = jax.random.uniform(k_t, (x1.shape[0],))
        tb = t[:, None, None]
        interpolant = (1 - tb) * x0 + tb * x1
        if compute_dtype is None:
            net_in = (interpolant, t, cond, time_cond)
        else:
            net_in = tuple(a.astype(compute_dtype)
                           for a in (interpolant, t, cond, time_cond))
        out = self.net.apply(
            net_params, *net_in,
            deterministic=not training,
            rngs={"dropout": k_drop} if training else None)
        loss = jnp.mean(jnp.square(out.astype(jnp.float32) - target))
        return loss, (interpolant, tb)

    def transfer_estimate(self, net_vars, interpolant, t, cond, tcond,
                          compute_dtype=None):
        """One-shot estimate of the clean target from a noised batch, used
        by the trainer's cycle step (model.py:578-700): integrate the
        velocity field from t straight to 1.  `t` is the (B, 1, 1) aux
        returned by diffusion_loss; inputs/outputs are f32, only the
        denoiser forward runs at `compute_dtype`."""
        cd = compute_dtype

        def c(v):
            return v if cd is None else v.astype(cd)

        v = self.net.apply(net_vars, c(interpolant), c(t[:, 0, 0]), c(cond),
                           c(tcond))
        return interpolant + (1 - t) * v.astype(jnp.float32)

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def _cfg_inputs(self, x, time, cond, time_cond):
        """Tile (x, time) 3x and build the [full | structure-only |
        unconditional] condition rows of the 3-way CFG batch
        (model.py:730-751).  Shared by the rectified and EDM forwards so
        the row layout can never drift between the two formulations."""
        full_x = jnp.concatenate([x, x, x], axis=0)
        full_time = jnp.concatenate([time, time, time], axis=0)
        null_c = jnp.full_like(cond, self.drop_value)
        full_cond = jnp.concatenate([cond, null_c, null_c], axis=0)
        null_tc = jnp.full_like(time_cond, self.drop_value)
        full_tcond = jnp.concatenate([time_cond, time_cond, null_tc], axis=0)
        return full_x, full_time, full_cond, full_tcond

    @staticmethod
    def _cfg_mix(out, guidance_timbre, guidance_structure):
        """Linear guidance mix of the 3 CFG rows (model.py:752-759); applies
        to velocities (rectified) or denoised estimates (EDM) alike."""
        o_full, o_tc, o_none = jnp.split(out, 3, axis=0)
        total = 0.5 * (guidance_structure + guidance_timbre)
        factor = guidance_timbre / jnp.maximum(guidance_structure, 0.01)
        return o_none + total * (o_tc + factor * (o_full - o_tc) - o_none)

    def model_forward(self, net_params, x, time, cond, time_cond,
                      guidance_timbre: float, guidance_structure: float,
                      cache=None, cache_index=0):
        """3-way CFG velocity (model.py:721-761) in one batched forward.

        With `cache` given, runs the streaming denoiser and returns
        (dx, new_cache).
        """
        full_x, full_time, full_cond, full_tcond = self._cfg_inputs(
            x, time, cond, time_cond)

        if cache is not None:
            if self.net_stream is None:
                raise ValueError(
                    f"denoiser arch {self.cfg.denoiser.arch!r} has no "
                    "streaming form (offline-only backbone)")
            dx, aux = self.net_stream.apply(
                {"params": net_params["params"], "cache": cache},
                full_x, full_time, full_cond, full_tcond,
                cache_index=cache_index, mutable=["cache"])
            new_cache = aux["cache"]
        else:
            dx = self.net.apply(net_params, full_x, full_time, full_cond,
                                full_tcond)
            new_cache = None

        dx = self._cfg_mix(dx, guidance_timbre, guidance_structure)
        return (dx, new_cache) if cache is not None else dx

    @partial(jax.jit, static_argnums=(0, 5, 8))
    def sample(self, net_params, x0, cond, time_cond, nb_steps: int,
               guidance_timbre: float = 1.0, guidance_structure: float = 1.0,
               compute_dtype=None):
        """Euler integration of the rectified flow, fused with lax.scan
        (replaces the Python loop at model.py:763-785).

        With `compute_dtype` (e.g. jnp.bfloat16) the denoiser runs at that
        precision while the Euler state accumulates in x0's dtype.
        """
        dt = 1.0 / nb_steps
        # t_i = i/n exactly — the same arithmetic the dynamic streaming
        # sampler uses, so stream == offline holds bit-for-bit
        t_values = jnp.arange(nb_steps, dtype=jnp.float32) / nb_steps
        if compute_dtype is not None:
            net_params = cast_floating(net_params, compute_dtype)
            cond = cond.astype(compute_dtype)
            time_cond = time_cond.astype(compute_dtype)

        def step(x, t):
            xi = (x if compute_dtype is None else x.astype(compute_dtype))
            time = jnp.full((x.shape[0],), t, xi.dtype)
            dx = self.model_forward(net_params, xi, time, cond, time_cond,
                                    guidance_timbre, guidance_structure)
            return x + dx.astype(x.dtype) * dt, None

        x, _ = jax.lax.scan(step, x0, t_values)
        return x

    @partial(jax.jit, static_argnums=(0, 9))
    def sample_stream(self, net_params, cache, x0, cond, time_cond,
                      nb_steps=1, guidance_timbre=1.0,
                      guidance_structure=1.0, compute_dtype=None):
        """One streaming buffer: denoise `chunk` frames with nb_steps Euler
        steps, each step indexing its own KV-cache slot; returns (x, cache).

        Replaces export.py:398-416 (sample + roll_cache per step).  The CFG
        triple shares the cache batch dim, so caches are built for batch 3B.

        ``nb_steps`` / ``guidance_timbre`` / ``guidance_structure`` are
        RUNTIME values (traced scalars), mirroring the reference's
        live-settable nn~ attributes (export.py:180-182,331-356): the host
        changes diffusion quality and guidance between buffers without
        recompiling or re-exporting.  The Euler loop is a
        ``lax.while_loop`` with a dynamic trip count, so a 1-step call
        does 1 denoiser forward regardless of the compiled maximum; the KV
        cache carries ``max_diffusion_steps`` slots, which bounds nb_steps.
        """
        nb = jnp.clip(jnp.asarray(nb_steps, jnp.int32), 1,
                      self.cfg.denoiser.max_diffusion_steps)
        nb_f = nb.astype(jnp.float32)
        dt = 1.0 / nb_f
        # strong f32 scalars: a live call (Python floats) and an exported
        # call (f32 attribute inputs) then produce bit-identical CFG mixes
        guidance_timbre = jnp.asarray(guidance_timbre, jnp.float32)
        guidance_structure = jnp.asarray(guidance_structure, jnp.float32)
        if compute_dtype is not None:
            # KV caches ride the carry, so they must already be at
            # compute_dtype (Streamer.init_state handles this)
            net_params = cast_floating(net_params, compute_dtype)
            cond = cond.astype(compute_dtype)
            time_cond = time_cond.astype(compute_dtype)

        def step(i, carry):
            x, cache = carry
            t = i.astype(jnp.float32) / nb_f
            xi = (x if compute_dtype is None else x.astype(compute_dtype))
            time = jnp.full((x.shape[0],), t, xi.dtype)
            dx, cache = self.model_forward(
                net_params, xi, time, cond, time_cond, guidance_timbre,
                guidance_structure, cache=cache, cache_index=i)
            return (x + dx.astype(x.dtype) * dt, cache)

        x, cache = jax.lax.fori_loop(0, nb, step, (x0, cache))
        return x, cache
