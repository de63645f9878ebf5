"""Encodec-style multi-scale complex-STFT discriminator.

Reference: /root/reference/after/autoencoder/networks/encodec_discriminator.py
(DiscriminatorSTFT / MultiScaleSTFTDiscriminator / EncodecDiscriminator).

Each scale: complex spectrogram (normalized, center=False) -> optional
|z|^p magnitude pre-scaling -> [real | imag] channels -> weight-normed 2-D
convs (LeakyReLU 0.2) over (time, freq) -> 1-channel logits.  Losses: hinge
GAN + normalized feature matching (baseAE.gin weights: fm 20.0, adv 0.0).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DiscriminatorConfig
from ..ops import stft as stft_ops


def _pad2d(k: Tuple[int, int], d: Tuple[int, int]) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p0 = ((k[0] - 1) * d[0]) // 2
    p1 = ((k[1] - 1) * d[1]) // 2
    return ((p0, p0), (p1, p1))


def wn_conv(features, kernel, strides=(1, 1), dilation=(1, 1), name=None):
    return nn.WeightNorm(
        nn.Conv(features, kernel, strides=strides,
                kernel_dilation=dilation,
                padding=_pad2d(kernel, dilation)), name=name)


class DiscriminatorSTFT(nn.Module):
    """One STFT scale -> (logits, feature maps)."""

    filters: int
    n_fft: int
    hop_length: int
    win_length: int
    spec_scale_pow: float = 0.0
    kernel_size: Tuple[int, int] = (3, 9)
    stride: Tuple[int, int] = (1, 2)
    dilations: Tuple[int, ...] = (1, 2, 4)
    max_filters: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: (B, T, 1) waveform -> complex spec (B, frames, bins)
        z = stft_ops.spectrogram(x[..., 0], self.n_fft, self.hop_length,
                                 self.win_length, power=None, normalized=True,
                                 center=False)
        if self.spec_scale_pow != 0.0:
            z = z * jnp.power(jnp.abs(z) + 1e-6, self.spec_scale_pow)
        h = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)  # (B, T', F, 2)

        fmap = []
        h = wn_conv(self.filters, self.kernel_size, name="conv_in")(h)
        h = nn.leaky_relu(h, 0.2)
        fmap.append(h)
        in_ch = self.filters
        for i, d in enumerate(self.dilations):
            out_ch = min(self.filters * (1 ** (i + 1)), self.max_filters)
            h = wn_conv(out_ch, self.kernel_size, self.stride, (d, 1),
                        name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            fmap.append(h)
        k = (self.kernel_size[0], self.kernel_size[0])
        h = wn_conv(min(self.filters, self.max_filters), k,
                    name="conv_mid")(h)
        h = nn.leaky_relu(h, 0.2)
        fmap.append(h)
        logits = wn_conv(1, k, name="conv_post")(h)
        return logits, fmap


class EncodecDiscriminator(nn.Module):
    """Multi-scale discriminator + combined GAN losses.

    `__call__(x, y)` -> (loss_gen, loss_dis, metrics) matching the reference
    interface (encodec_discriminator.py:249-297).
    """

    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray,
                 batched: bool = False):
        cfg = self.cfg
        dis_loss = 0.0
        adv_loss = 0.0
        fm_loss = 0.0
        pred_true = 0.0
        pred_fake = 0.0
        n = len(cfg.n_ffts)

        B = x.shape[0]
        t = min(x.shape[1], y.shape[1])
        # batched=True runs each scale once over [x ‖ y] instead of two
        # separate conv chains — per-example ops make it mathematically
        # identical, with one kernel chain at 2B batch instead of two at B.
        # Only the DISCRIMINATOR step should use it: its backward needs both
        # chains anyway (grads w.r.t. disc params), so batching is
        # FLOP-neutral and utilization-positive.  The GENERATOR step must
        # keep the split form: its backward flows only through the y chain,
        # and a concatenated graph would pay the x-half cotangents too.
        if batched:
            xy = jnp.concatenate([x[:, :t], y[:, :t]], axis=0)
        for i in range(n):
            disc = DiscriminatorSTFT(cfg.filters, cfg.n_ffts[i],
                                     cfg.hop_lengths[i], cfg.win_lengths[i],
                                     cfg.spec_scale_pow, name=f"disc_{i}")
            if batched:
                logits, fmaps = disc(xy)
                logit_t, logit_f = logits[:B], logits[B:]
                fmap_t = [f[:B] for f in fmaps]
                fmap_f = [f[B:] for f in fmaps]
            else:
                logit_t, fmap_t = disc(x)
                logit_f, fmap_f = disc(y)

            # hinge GAN (encodec_discriminator.py:24)
            dis_loss += jnp.mean(nn.relu(1 - logit_t) + nn.relu(1 + logit_f))
            adv_loss += -jnp.mean(logit_f)
            pred_true += jnp.mean(logit_t)
            pred_fake += jnp.mean(logit_f)

            # normalized feature matching
            fm = 0.0
            for ft, ff in zip(fmap_t, fmap_f):
                d = jnp.mean(jnp.abs(ft - ff))
                if cfg.normalize_losses:
                    d = d / jnp.mean(jnp.abs(ft))
                fm += d
            fm_loss += fm / len(fmap_t)

        dis_loss = dis_loss / n
        adv_loss = adv_loss / n
        fm_loss = fm_loss / n

        loss_gen = (adv_loss * cfg.weight_adversarial
                    + fm_loss * cfg.weight_feature_matching)
        metrics = {
            "discriminator": dis_loss,
            "adversarial": adv_loss,
            "feature_matching": fm_loss,
            "pred_real": pred_true,
            "pred_fake": pred_fake,
        }
        return loss_gen, dis_loss, metrics
