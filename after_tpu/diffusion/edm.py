"""EDM (Karras et al., "Elucidating the Design Space of Diffusion-Based
Generative Models") timbre-transfer model.

The reference CLI advertises ``after train --model edm``
(/root/reference/after_scripts/train.py:91-93) but imports a class that does
not exist in the package (`after/diffusion/__init__.py` exports only
RectifiedFlow — SURVEY §2.5 documents the dead import); its midi.gin also
binds a ``SIGMA_DATA`` macro no module reads.  Here the surface works: this
class plugs into the same trainer / pipeline / streamer / export machinery as
RectifiedFlow (identical method signatures), so ``--model edm`` trains,
samples, streams and exports end-to-end.

Design (TPU-first, mirroring rectified_flow.py):

- denoiser preconditioning D(x; s) = c_skip(s)*x + c_out(s)*F(c_in(s)*x,
  c_noise(s)) with sigma_data from config; F is the same DiT backbone, whose
  scalar "time" input receives c_noise = ln(s)/4;
- training draws log s ~ N(p_mean, p_std) and minimizes the EDM-weighted MSE
  lambda(s) * ||D - x1||^2, lambda = (s^2 + sd^2) / (s*sd)^2;
- sampling integrates the probability-flow ODE down the Karras sigma ladder:
  offline via one lax.scan (Heun 2nd order by default), streaming via a
  dynamic-trip-count fori_loop with one KV-cache slot per step (Euler), the
  same structure the rectified sampler uses, so nb_steps / guidances remain
  RUNTIME attributes of exported artifacts;
- the 3-way CFG (full / structure-only / unconditional) applies the same
  linear mix as rectified flow, but to denoised estimates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import cast_floating
from .rectified_flow import RectifiedFlow


class EDM(RectifiedFlow):
    """Karras-EDM variant; same sub-models, same external interface."""

    # ------------------------------------------------------------------
    # preconditioning
    # ------------------------------------------------------------------

    def _precond(self, sigma):
        """sigma (B,) f32 -> (c_skip, c_out, c_in, c_noise), each (B,)."""
        sd = self.cfg.edm.sigma_data
        var = sigma * sigma + sd * sd
        c_skip = (sd * sd) / var
        c_out = sigma * sd * jax.lax.rsqrt(var)
        c_in = jax.lax.rsqrt(var)
        c_noise = 0.25 * jnp.log(jnp.maximum(sigma, 1e-20))
        return c_skip, c_out, c_in, c_noise

    def denoise(self, net_params, x, sigma, cond, time_cond,
                cache=None, cache_index=0, compute_dtype=None,
                training=False, rng=None):
        """Preconditioned denoised estimate D(x; sigma), f32 out.

        With `cache`, runs the streaming backbone and returns (D, new_cache).
        Preconditioning and the skip connection stay f32; only the backbone
        F runs at `compute_dtype`.
        """
        c_skip, c_out, c_in, c_noise = self._precond(
            sigma.astype(jnp.float32))
        x32 = x.astype(jnp.float32)
        f_in = x32 * c_in[:, None, None]
        if compute_dtype is not None:
            f_in = f_in.astype(compute_dtype)
            c_noise = c_noise.astype(compute_dtype)
            cond = cond.astype(compute_dtype)
            time_cond = time_cond.astype(compute_dtype)
        if cache is not None:
            if self.net_stream is None:
                raise ValueError(
                    f"denoiser arch {self.cfg.denoiser.arch!r} has no "
                    "streaming form (offline-only backbone)")
            F, aux = self.net_stream.apply(
                {"params": net_params["params"], "cache": cache},
                f_in, c_noise, cond, time_cond,
                cache_index=cache_index, mutable=["cache"])
            new_cache = aux["cache"]
        else:
            F = self.net.apply(
                net_params, f_in, c_noise, cond, time_cond,
                deterministic=not training,
                rngs={"dropout": rng} if training else None)
            new_cache = None
        D = c_skip[:, None, None] * x32 + c_out[:, None, None] * F.astype(
            jnp.float32)
        return (D, new_cache) if cache is not None else D

    # ------------------------------------------------------------------
    # training loss
    # ------------------------------------------------------------------

    def diffusion_loss(self, net_params, rng, x1, time_cond, cond,
                       training: bool = True, compute_dtype=None):
        """EDM-weighted denoising MSE.

        Returns (loss, (x_noised, t)) with the same aux contract the trainer
        expects from rectified flow: `x_noised` plays the interpolant role in
        the cycle step and `t` (B, 1, 1) is c_skip(sigma) in (0, 1] — 0 at
        pure noise, 1 at clean data, exactly like rectified-flow t, so the
        trainer's cycle ramp scaling keeps its semantics and
        `transfer_estimate` can invert it back to sigma.
        """
        e = self.cfg.edm
        k_noise, k_sigma, k_drop = jax.random.split(rng, 3)
        B = x1.shape[0]
        sigma = jnp.exp(e.p_mean + e.p_std
                        * jax.random.normal(k_sigma, (B,)))
        noise = jax.random.normal(k_noise, x1.shape) * sigma[:, None, None]
        x_noised = x1 + noise

        D = self.denoise(net_params, x_noised, sigma, cond, time_cond,
                         compute_dtype=compute_dtype, training=training,
                         rng=k_drop)
        sd = e.sigma_data
        weight = (sigma * sigma + sd * sd) / jnp.square(sigma * sd)
        loss = jnp.mean(weight[:, None, None] * jnp.square(D - x1))
        c_skip = (sd * sd) / (sigma * sigma + sd * sd)
        return loss, (x_noised, c_skip[:, None, None])

    def transfer_estimate(self, net_vars, interpolant, t, cond, tcond,
                          compute_dtype=None):
        """Cycle-step transfer: one-shot denoised estimate of the noised
        batch.  `t` is the c_skip aux from diffusion_loss; invert it to
        sigma = sd*sqrt(1/c_skip - 1)."""
        sd = self.cfg.edm.sigma_data
        c_skip = jnp.clip(t[:, 0, 0], 1e-6, 1.0)
        sigma = sd * jnp.sqrt(jnp.maximum(1.0 / c_skip - 1.0, 0.0))
        return self.denoise(net_vars, interpolant, sigma, cond, tcond,
                            compute_dtype=compute_dtype)

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def model_forward(self, net_params, x, sigma, cond, time_cond,
                      guidance_timbre: float, guidance_structure: float,
                      cache=None, cache_index=0, compute_dtype=None):
        """3-way CFG denoised estimate in one batched forward.

        Same mixing arithmetic as rectified flow (model.py:730-759), applied
        to D(x; sigma) instead of the velocity field.  `sigma` is (B,).
        """
        full_x, full_sigma, full_cond, full_tcond = self._cfg_inputs(
            x, sigma, cond, time_cond)

        out = self.denoise(net_params, full_x, full_sigma, full_cond,
                           full_tcond, cache=cache, cache_index=cache_index,
                           compute_dtype=compute_dtype)
        D, new_cache = out if cache is not None else (out, None)
        D = self._cfg_mix(D, guidance_timbre, guidance_structure)
        return (D, new_cache) if cache is not None else D

    # ------------------------------------------------------------------
    # sigma schedule (shared by offline and streaming: identical arithmetic
    # so stream == offline holds for the Euler path)
    # ------------------------------------------------------------------

    def _sigma_at(self, i, nb_f):
        """Karras sigma_i for float step index i in [0, nb]; sigma_nb = 0."""
        e = self.cfg.edm
        r = 1.0 / e.rho
        frac = jnp.where(nb_f > 1.0,
                         i / jnp.maximum(nb_f - 1.0, 1.0), 0.0)
        sig = (e.sigma_max ** r
               + frac * (e.sigma_min ** r - e.sigma_max ** r)) ** e.rho
        return jnp.where(i > nb_f - 0.5, 0.0, sig)

    @partial(jax.jit, static_argnums=(0, 5, 8))
    def sample(self, net_params, x0, cond, time_cond, nb_steps: int,
               guidance_timbre: float = 1.0, guidance_structure: float = 1.0,
               compute_dtype=None):
        """Probability-flow ODE down the Karras ladder, one lax.scan.

        `x0` is unit noise (the callers pass N(0,1), as for rectified flow);
        it is scaled by sigma_0 here.  Heun 2nd order when cfg.edm.heun
        (the EDM paper default; the correction is skipped on the final step
        where sigma_{i+1} = 0), plain Euler otherwise.
        """
        nb_f = jnp.float32(nb_steps)
        if compute_dtype is not None:
            net_params = cast_floating(net_params, compute_dtype)
        x = x0.astype(jnp.float32) * self._sigma_at(jnp.float32(0.0), nb_f)
        B = x0.shape[0]

        def fwd(x, sigma_scalar):
            sigma = jnp.full((B,), sigma_scalar, jnp.float32)
            return self.model_forward(
                net_params, x, sigma, cond, time_cond,
                guidance_timbre, guidance_structure,
                compute_dtype=compute_dtype)

        def step(x, i):
            sigma = self._sigma_at(i, nb_f)
            sigma_next = self._sigma_at(i + 1.0, nb_f)
            d = (x - fwd(x, sigma)) / sigma
            x_next = x + (sigma_next - sigma) * d
            if self.cfg.edm.heun:
                def correct(x_next):
                    # guard the division: lax.cond lowers to select under
                    # vmap, executing BOTH branches — sigma_next=0 on the
                    # final step must not produce 0/0 inside this one
                    d2 = ((x_next - fwd(x_next, sigma_next))
                          / jnp.maximum(sigma_next, 1e-20))
                    return x + (sigma_next - sigma) * 0.5 * (d + d2)
                x_next = jax.lax.cond(sigma_next > 0.0, correct,
                                      lambda xn: xn, x_next)
            return x_next, None

        x, _ = jax.lax.scan(step, x, jnp.arange(nb_steps, dtype=jnp.float32))
        return x.astype(x0.dtype)

    @partial(jax.jit, static_argnums=(0, 9))
    def sample_stream(self, net_params, cache, x0, cond, time_cond,
                      nb_steps=1, guidance_timbre=1.0,
                      guidance_structure=1.0, compute_dtype=None):
        """One streaming buffer: Euler down the Karras ladder with a dynamic
        trip count; step i reads/writes KV-cache slot i (same structure as
        the rectified streaming sampler, so nb_steps / guidances stay
        runtime-settable attributes of exported artifacts)."""
        nb = jnp.clip(jnp.asarray(nb_steps, jnp.int32), 1,
                      self.cfg.denoiser.max_diffusion_steps)
        nb_f = nb.astype(jnp.float32)
        guidance_timbre = jnp.asarray(guidance_timbre, jnp.float32)
        guidance_structure = jnp.asarray(guidance_structure, jnp.float32)
        if compute_dtype is not None:
            net_params = cast_floating(net_params, compute_dtype)
            # denoise() casts cond/tcond per call; KV caches already ride
            # the carry at compute dtype (Streamer.init_state)
        B = x0.shape[0]
        x_init = x0.astype(jnp.float32) * self._sigma_at(jnp.float32(0.0),
                                                         nb_f)

        def step(i, carry):
            x, cache = carry
            i_f = i.astype(jnp.float32)
            sigma_s = self._sigma_at(i_f, nb_f)
            sigma_next = self._sigma_at(i_f + 1.0, nb_f)
            sigma = jnp.full((B,), sigma_s, jnp.float32)
            D, cache = self.model_forward(
                net_params, x, sigma, cond, time_cond, guidance_timbre,
                guidance_structure, cache=cache, cache_index=i,
                compute_dtype=compute_dtype)
            d = (x - D) / sigma_s
            return (x + (sigma_next - sigma_s) * d, cache)

        x, cache = jax.lax.fori_loop(0, nb, step, (x_init, cache))
        return x.astype(x0.dtype), cache
