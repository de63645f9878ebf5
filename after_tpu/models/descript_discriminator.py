"""Descript-audio-codec-style discriminator (alternative to Encodec).

Reference: /root/reference/after/autoencoder/networks/descript_discriminator.py
(MPD :64 multi-period, MSD :103 multi-scale, MRD :152 multi-band
multi-resolution; DescriptDiscriminator :220).  Gin-selectable in the
reference; provided here for discriminator parity.  All convs weight-normed
with LeakyReLU(0.1) activations.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stft as stft_ops

BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


def _wn2d(feat, k, s=(1, 1), d=(1, 1), name=None):
    pad = (((k[0] - 1) * d[0] // 2,) * 2, ((k[1] - 1) * d[1] // 2,) * 2)
    return nn.WeightNorm(nn.Conv(feat, k, strides=s, kernel_dilation=d,
                                 padding=pad), name=name)


def _wn1d(feat, k, s=1, groups=1, name=None):
    pad = ((k - 1) // 2, (k - 1) // 2)
    return nn.WeightNorm(nn.Conv(feat, (k,), strides=(s,), padding=(pad,),
                                 feature_group_count=groups), name=name)


class MPD(nn.Module):
    """Multi-period discriminator: fold time into (T/p, p) and conv2d."""

    period: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 1)
        B, T, C = x.shape
        rem = (-T) % self.period
        if rem:
            x = jnp.pad(x, ((0, 0), (0, rem), (0, 0)), mode="reflect")
        h = x.reshape(B, -1, self.period, C)    # (B, L, p, 1)
        fmap = []
        for i, feat in enumerate((32, 128, 256, 512)):
            h = _wn2d(feat, (5, 1), (3, 1), name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = _wn2d(512, (5, 1), (1, 1), name="conv_4")(h)
        h = nn.leaky_relu(h, 0.1)
        fmap.append(h)
        h = _wn2d(1, (3, 1), name="conv_post")(h)
        fmap.append(h)
        return fmap


class MSD(nn.Module):
    """Multi-scale discriminator over (optionally) downsampled audio."""

    scale: int = 1

    @nn.compact
    def __call__(self, x):
        if self.scale != 1:
            from ..ops.pqmf import _kaiser_filter
            filt = _kaiser_filter(np.pi / self.scale, 140).astype(np.float32)
            if not len(filt) % 2:
                filt = np.pad(filt, (1, 0))
            k = jnp.asarray(filt)[:, None, None]
            x = jax.lax.conv_general_dilated(
                x, k, (self.scale,), [(len(filt) // 2, len(filt) // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"))
        fmap = []
        h = x
        specs = [(16, 15, 1, 1), (64, 41, 4, 4), (256, 41, 4, 16),
                 (1024, 41, 4, 64), (1024, 41, 4, 256), (1024, 5, 1, 1)]
        for i, (feat, k, s, g) in enumerate(specs):
            h = _wn1d(feat, k, s, groups=min(g, h.shape[-1]),
                      name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = _wn1d(1, 3, name="conv_post")(h)
        fmap.append(h)
        return fmap


class MRD(nn.Module):
    """Multi-band multi-resolution STFT discriminator."""

    window_length: int
    hop_factor: float = 0.25
    bands: Tuple = BANDS

    @nn.compact
    def __call__(self, x):
        n_fft = self.window_length // 2 + 1
        z = stft_ops.stft(x[..., 0], self.window_length,
                          int(self.hop_factor * self.window_length))
        h = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)  # (B, T', F, 2)
        fmap = []
        outs = []
        for bi, (lo, hi) in enumerate(self.bands):
            band = h[:, :, int(lo * n_fft):int(hi * n_fft)]
            for i, (k, s) in enumerate([((3, 9), (1, 1)), ((3, 9), (1, 2)),
                                        ((3, 9), (1, 2)), ((3, 9), (1, 2)),
                                        ((3, 3), (1, 1))]):
                band = _wn2d(32, k, s, name=f"band{bi}_conv_{i}")(band)
                band = nn.leaky_relu(band, 0.1)
                fmap.append(band)
            outs.append(band)
        h = jnp.concatenate(outs, axis=2)
        h = _wn2d(1, (3, 3), name="conv_post")(h)
        fmap.append(h)
        return fmap


class DescriptDiscriminator(nn.Module):
    """MPD x periods + MSD x rates + MRD x ffts; hinge + L1 feature matching
    (descript_discriminator.py:220-340)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    rates: Tuple[int, ...] = ()
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    weight_feature_matching: float = 15.0
    weight_adversarial: float = 1.0
    num_skipped_features: int = 0

    def _preprocess(self, y):
        y = y - jnp.mean(y, axis=1, keepdims=True)
        return 0.8 * y / (jnp.max(jnp.abs(y), axis=1, keepdims=True) + 1e-9)

    @nn.compact
    def __call__(self, x, y, batched: bool = False):
        """x true, y fake -> (loss_gen, loss_dis, metrics).

        ``batched=True`` runs each sub-discriminator once over [x ‖ y]
        (identical per-example math, one conv chain at 2B); use it only in
        the discriminator step — the generator backward only needs the y
        chain (see EncodecDiscriminator).
        """
        B = x.shape[0]
        x = self._preprocess(x)
        y = self._preprocess(y)
        if batched:
            t = min(x.shape[1], y.shape[1])
            xy = jnp.concatenate([x[:, :t], y[:, :t]], axis=0)
        discs = ([MPD(p, name=f"mpd_{p}") for p in self.periods]
                 + [MSD(r, name=f"msd_{r}") for r in self.rates]
                 + [MRD(f, name=f"mrd_{f}") for f in self.fft_sizes])
        fm, dis_loss, adv_loss, pred_real, pred_fake = 0., 0., 0., 0., 0.
        for d in discs:
            if batched:
                frf = d(xy)
                fr = [f[:B] for f in frf]
                ff = [f[B:] for f in frf]
            else:
                fr = d(x)
                ff = d(y)
            ns = self.num_skipped_features
            cur = sum(jnp.mean(jnp.abs(a - b))
                      for a, b in zip(fr[ns:], ff[ns:])) / len(fr[ns:])
            fm += cur
            score_r, score_f = fr[-1], ff[-1]
            dis_loss += (jnp.mean(nn.relu(1 - score_r))
                         + jnp.mean(nn.relu(1 + score_f)))
            adv_loss += -jnp.mean(score_f)
            pred_real += jnp.mean(score_r)
            pred_fake += jnp.mean(score_f)
        loss_gen = (adv_loss * self.weight_adversarial
                    + fm * self.weight_feature_matching)
        metrics = {"discriminator": dis_loss, "adversarial": adv_loss,
                   "feature_matching": fm, "pred_real": pred_real,
                   "pred_fake": pred_fake}
        return loss_gen, dis_loss, metrics
