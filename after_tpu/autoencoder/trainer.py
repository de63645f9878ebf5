"""Codec GAN trainer: alternating generator / discriminator jitted steps.

Reference: /root/reference/after/autoencoder/trainer.py (Trainer).  Structure:
- generator step: MR-STFT reconstruction (weight-decayed after warmup,
  trainer.py:146-151) + bottleneck regularisation (warmup-ramped) + feature
  matching / adversarial terms once the GAN warmup has elapsed;
- discriminator step every `update_discriminator_every` steps after warmup
  (trainer.py:157-177), hinge loss;
- AdamW (0.9, 0.999) for the codec, (0.8, 0.9) for the discriminator, both
  with exponential lr decay gamma 0.999996 (trainer.py:119-134) and grad clip
  2.0.

The reference's Python branching on (warmup, step % k) becomes host-side
selection between two jitted functions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import AETrainConfig, AutoEncoderConfig, DiscriminatorConfig
from ..models.autoencoder import AudioCodec
from ..models.discriminator import EncodecDiscriminator
from ..utils.precision import cast_floating, resolve_dtype
from .losses import multi_resolution_stft_loss, spectral_distance


@dataclasses.dataclass
class AETrainState:
    codec_vars: Any
    disc_vars: Any
    opt_state: Any
    disc_opt_state: Any
    step: int


class AutoencoderTrainer:

    def __init__(self, ae_cfg: AutoEncoderConfig,
                 train_cfg: Optional[AETrainConfig] = None,
                 disc_cfg: Optional[DiscriminatorConfig] = None):
        self.cfg = ae_cfg
        self.tc = train_cfg or AETrainConfig()
        self.dcfg = disc_cfg or DiscriminatorConfig()
        # mixed precision: codec + discriminator run at tc.compute_dtype
        # (bf16 = 2x MXU rate; the EncodecDiscriminator forward measures
        # near the f32 roofline, so it is MXU-rate-limited).  Master params
        # and both optimizers stay f32 — params are cast INSIDE the
        # differentiated loss so grads accumulate in f32 — and all loss
        # math runs f32 on upcast activations.
        self.compute_dtype = resolve_dtype(getattr(self.tc, "compute_dtype",
                                                   None))
        self.codec = AudioCodec(ae_cfg)
        if self.dcfg.kind == "descript":
            from ..models.descript_discriminator import DescriptDiscriminator
            self.disc = DescriptDiscriminator(
                periods=tuple(self.dcfg.descript_periods),
                fft_sizes=tuple(self.dcfg.descript_fft_sizes),
                weight_feature_matching=(
                    self.dcfg.descript_weight_feature_matching),
                weight_adversarial=self.dcfg.descript_weight_adversarial)
        else:
            self.disc = EncodecDiscriminator(self.dcfg)

        lr = optax.exponential_decay(self.tc.lr, 1, self.tc.lr_decay)
        # apply_if_finite: skip (rather than apply) updates from a batch
        # whose backward produced non-finite gradients, keeping params and
        # Adam moments clean (see diffusion/trainer.py for the failure mode).
        self.optimizer = optax.apply_if_finite(optax.chain(
            optax.clip_by_global_norm(self.tc.grad_clip),
            optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=0.01)),
            max_consecutive_errors=10000)
        self.disc_optimizer = optax.apply_if_finite(optax.chain(
            optax.clip_by_global_norm(self.tc.grad_clip_disc),
            optax.adamw(lr, b1=0.8, b2=0.9, weight_decay=0.01)),
            max_consecutive_errors=10000)

    def init(self, rng: jax.Array, batch_size: int = 1) -> AETrainState:
        # jitted init (see CLAUDE.md: eager init is slow on remote backends)
        def go(rng):
            k1, k2 = jax.random.split(rng)
            x = jnp.zeros((batch_size, self.tc.num_signal, 1))
            codec_vars = self.codec.init(k1, x)
            disc_vars = self.disc.init(k2, x[:, :8192], x[:, :8192])
            return (codec_vars, disc_vars,
                    self.optimizer.init(codec_vars["params"]),
                    self.disc_optimizer.init(disc_vars["params"]))

        codec_vars, disc_vars, opt, dopt = jax.jit(go)(rng)
        return AETrainState(codec_vars, disc_vars, opt, dopt, 0)

    # ------------------------------------------------------------------

    def _recon_weights(self, step: int):
        tc = self.tc
        w_wave = (1.0 if step < tc.warmup_steps
                  else tc.rec_loss_decay ** (step - tc.warmup_steps))
        w_reg = (min(step / tc.warmup_regularisation_loss, 1.0)
                 * tc.weight_regularisation_loss)
        return w_wave, w_reg

    @partial(jax.jit, static_argnums=(0, 4), donate_argnums=(1,))
    def gen_step(self, state_tuple, x, rng, use_gan: bool, w_wave, w_reg):
        codec_vars, disc_vars, opt_state = state_tuple
        cd = self.compute_dtype

        def loss_fn(params):
            cv = {**codec_vars, "params": params if cd is None
                  else cast_floating(params, cd)}
            # rngs={'noise': ...}: without it the NoiseGenerator falls back
            # to a FIXED key and synthesises the identical noise realisation
            # every step (the GAN would learn against a frozen noise signal)
            y, yb, z, regloss, xb = self.codec.apply(
                cv, x if cd is None else x.astype(cd),
                rng=rng, rngs={"noise": jax.random.fold_in(rng, 1)})
            regloss = regloss.astype(jnp.float32)
            n = min(x.shape[1], y.shape[1])
            # loss math in f32: xa from the f32 input, ya upcast (the bf16
            # quantization happened inside the codec; the STFT/log/L1 math
            # itself must not run at 8-bit mantissa)
            xa, ya = x[:, :n], y[:, :n].astype(jnp.float32)
            mrstft = multi_resolution_stft_loss(xa, ya, self.tc, self.cfg.sr)
            loss = w_wave * mrstft + w_reg * regloss
            metrics = {"mrstft": mrstft, "regularisation_loss": regloss}
            if self.tc.spectral_distance_weight > 0:
                sd = spectral_distance(xa, ya, self.cfg.sr,
                                       self.tc.spectral_scales,
                                       self.tc.spectral_mels)
                loss = loss + w_wave * self.tc.spectral_distance_weight * sd
                metrics["spectral_distance"] = sd
            if use_gan:
                dv = (disc_vars if cd is None
                      else {**disc_vars,
                            "params": cast_floating(disc_vars["params"], cd)})
                loss_gen, _, dmetrics = self.disc.apply(
                    dv, xa if cd is None else xa.astype(cd),
                    y[:, :n])
                loss = loss + loss_gen.astype(jnp.float32)
                metrics.update({k: v.astype(jnp.float32)
                                for k, v in dmetrics.items()
                                if k in ("feature_matching", "adversarial")})
            metrics["total_loss"] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            codec_vars["params"])
        updates, opt_state = self.optimizer.update(grads, opt_state,
                                                   codec_vars["params"])
        params = optax.apply_updates(codec_vars["params"], updates)
        codec_vars = {**codec_vars, "params": params}
        metrics["skipped_nonfinite"] = opt_state.total_notfinite
        return (codec_vars, disc_vars, opt_state), metrics

    @partial(jax.jit, static_argnums=0, donate_argnums=(1,))
    def disc_step(self, state_tuple, x, rng):
        codec_vars, disc_vars, disc_opt_state = state_tuple
        cd = self.compute_dtype
        cv = (codec_vars if cd is None
              else {**codec_vars,
                    "params": cast_floating(codec_vars["params"], cd)})
        y, *_ = self.codec.apply(cv, x if cd is None else x.astype(cd),
                                 rng=rng,
                                 rngs={"noise": jax.random.fold_in(rng, 1)})
        y = jax.lax.stop_gradient(y)
        n = min(x.shape[1], y.shape[1])
        xa = x[:, :n] if cd is None else x[:, :n].astype(cd)
        ya = y[:, :n]

        def loss_fn(dparams):
            dv = {**disc_vars, "params": dparams if cd is None
                  else cast_floating(dparams, cd)}
            # tc.disc_batched: one [x ‖ y] conv chain per scale — identical
            # math (disc-param grads need both chains anyway); measured
            # neutral at B=8 on v5e, opt-in for small-batch configs. The gen
            # step must keep the split form (its backward only flows
            # through y).
            _, loss_dis, metrics = self.disc.apply(
                dv, xa, ya, batched=self.tc.disc_batched)
            return loss_dis.astype(jnp.float32), metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_vars["params"])
        updates, disc_opt_state = self.disc_optimizer.update(
            grads, disc_opt_state, disc_vars["params"])
        dparams = optax.apply_updates(disc_vars["params"], updates)
        disc_vars = {**disc_vars, "params": dparams}
        return (codec_vars, disc_vars, disc_opt_state), metrics

    @partial(jax.jit, static_argnums=0)
    def val_step(self, codec_vars, x, rng):
        """Reconstruction losses + audio on a validation batch, no GAN terms
        (reference trainer.py:221-260 val_step)."""
        y, _, _, regloss, _ = self.codec.apply(
            codec_vars, x, rng=rng, rngs={"noise": jax.random.fold_in(rng, 1)})
        n = min(x.shape[1], y.shape[1])
        xa, ya = x[:, :n], y[:, :n]
        mrstft = multi_resolution_stft_loss(xa, ya, self.tc, self.cfg.sr)
        metrics = {"val_mrstft": mrstft, "val_regularisation_loss": regloss,
                   "val_total_loss": mrstft + regloss}
        if self.tc.spectral_distance_weight > 0:
            metrics["val_spectral_distance"] = spectral_distance(
                xa, ya, self.cfg.sr, self.tc.spectral_scales,
                self.tc.spectral_mels)
        return metrics, ya

    def validate(self, state: AETrainState, val_batches):
        """Average val_step losses over fixed batches; returns (losses,
        true/reconstruction audio pair from the last batch) — the
        reference's every-10k-step human-in-the-loop check
        (trainer.py:324-344)."""
        import numpy as np
        sums, count = {}, 0
        x = y = None
        for i, x_np in enumerate(val_batches):
            x = jnp.asarray(x_np)
            metrics, y = self.val_step(state.codec_vars, x,
                                       jax.random.PRNGKey(i))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        losses = {k: v / max(count, 1) for k, v in sums.items()}
        return losses, (np.asarray(x), np.asarray(y))

    # ------------------------------------------------------------------

    def fit(self, state: AETrainState, batches: Iterator, max_steps=None,
            callback=None, rng: Optional[jax.Array] = None,
            mesh=None) -> AETrainState:
        """batches yield (B, num_signal, 1) waveform arrays.

        With ``mesh`` set (see parallel.shard_ae_state) each batch is sharded
        over the "data" axis and both GAN steps run SPMD — the
        Accelerate-DDP role in the reference
        (/root/reference/after_scripts/train_autoencoder.py:211-216)."""
        tc = self.tc
        max_steps = max_steps if max_steps is not None else tc.max_steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if mesh is not None:
            from ..parallel import global_batch_from_local

        for x in batches:
            if state.step >= max_steps:
                break
            step = state.step
            rng, krng = jax.random.split(rng)
            x = (global_batch_from_local(x, mesh) if mesh is not None
                 else jnp.asarray(x))
            warm = step > tc.warmup_steps

            if warm and step % tc.update_discriminator_every == 0:
                (cv, dv, dopt), metrics = self.disc_step(
                    (state.codec_vars, state.disc_vars,
                     state.disc_opt_state), x, krng)
                state = dataclasses.replace(
                    state, codec_vars=cv, disc_vars=dv, disc_opt_state=dopt,
                    step=step + 1)
            else:
                w_wave, w_reg = self._recon_weights(step)
                (cv, dv, opt), metrics = self.gen_step(
                    (state.codec_vars, state.disc_vars, state.opt_state),
                    x, krng, warm, w_wave, w_reg)
                state = dataclasses.replace(
                    state, codec_vars=cv, disc_vars=dv, opt_state=opt,
                    step=step + 1)

            if callback is not None:
                # metrics stay as device arrays: converting would force a
                # host sync every step (see MetricsLogger for lazy flush)
                callback(state, metrics)
        return state
