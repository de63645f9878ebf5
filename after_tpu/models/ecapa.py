"""ECAPA-TDNN timbre encoder — TPU rebuild.

Reference: /root/reference/after/diffusion/networks/ecapa_encoder.py:459
(ECAPATDNN with TDNNBlock / Res2NetBlock / SEBlock / SERes2NetBlock /
AttentiveStatisticsPooling).

Maps a window of codec latent frames (B, T, in_size) to a global timbre vector
(B, out_dim).  Convs use 'same' reflect padding (ecapa_encoder.py:74-80).
Streaming requires no conv caches: the exported graph re-runs the full encoder
on a ring buffer of latent frames each step (export.py:419-430), which here is
just this module jitted on the buffered window.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ECAPAConfig


class ReflectConv(nn.Module):
    """'same' conv over (B, T, C) with reflect padding on time."""

    features: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        span = self.dilation * (self.kernel_size - 1)
        pad = span // 2
        if pad > 0:
            x = jnp.pad(x, [(0, 0), (pad, span - pad), (0, 0)], mode="reflect")
        return nn.Conv(self.features, (self.kernel_size,), padding="VALID",
                       kernel_dilation=(self.dilation,),
                       feature_group_count=self.groups)(x)


class TDNNBlock(nn.Module):
    features: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = ReflectConv(self.features, self.kernel_size, self.dilation,
                        self.groups, name="conv")(x)
        h = nn.relu(h)
        return nn.BatchNorm(use_running_average=not training, momentum=0.9, name="bn")(h)


class Res2NetBlock(nn.Module):
    features: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        chunks = jnp.split(x, self.scale, axis=-1)
        hidden = self.features // self.scale
        y = [chunks[0]]
        y_i = None
        for i in range(self.scale - 1):
            x_i = chunks[i + 1]
            inp = x_i if i == 0 else x_i + y_i
            y_i = TDNNBlock(hidden, self.kernel_size, self.dilation,
                            name=f"tdnn_{i}")(inp, training)
            y.append(y_i)
        return jnp.concatenate(y, axis=-1)


class SEBlock(nn.Module):
    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1, keepdims=True)
        s = nn.relu(nn.Dense(self.se_channels, name="conv1")(s))
        s = nn.sigmoid(nn.Dense(self.out_channels, name="conv2")(s))
        return s * x


class SERes2NetBlock(nn.Module):
    features: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        residual = x
        if x.shape[-1] != self.features:
            residual = nn.Dense(self.features, name="shortcut")(x)
        h = TDNNBlock(self.features, 1, 1, self.groups, name="tdnn1")(x, training)
        h = Res2NetBlock(self.features, self.res2net_scale, self.kernel_size,
                         self.dilation, name="res2net")(h, training)
        h = TDNNBlock(self.features, 1, 1, self.groups, name="tdnn2")(h, training)
        h = SEBlock(self.se_channels, self.features, name="se")(h)
        return h + residual


class AttentiveStatisticsPooling(nn.Module):
    """(B, T, C) -> (B, 2C) attention-weighted mean ⊕ std
    (ecapa_encoder.py:366-455)."""

    attention_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        B, T, C = x.shape
        eps = 1e-12

        def stats(m, y):
            mean = jnp.sum(m * y, axis=1)
            var = jnp.sum(m * jnp.square(y - mean[:, None]), axis=1)
            return mean, jnp.sqrt(jnp.maximum(var, eps))

        if self.global_context:
            mean, std = stats(jnp.full((B, T, 1), 1.0 / T), x)
            attn_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean[:, None], x.shape),
                 jnp.broadcast_to(std[:, None], x.shape)], axis=-1)
        else:
            attn_in = x

        a = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(
            attn_in, training)
        a = nn.Dense(C, name="conv")(jnp.tanh(a))
        a = jax.nn.softmax(a, axis=1)
        mean, std = stats(a, x)
        return jnp.concatenate([mean, std], axis=-1)


class ECAPAEncoder(nn.Module):
    """Codec latents (B, T, in_size) -> timbre vector (B, out_dim).

    `__call__` returns (z, mean, reg) mirroring return_full
    (ecapa_encoder.py:568-624); use `encode` for z alone.
    """

    cfg: ECAPAConfig

    @nn.compact
    def __call__(self, x, training: bool = False,
                 rng: Optional[jax.Array] = None):
        cfg = self.cfg
        out_size = cfg.out_dim * (2 if cfg.regularisation == "vae" else 1)

        feats = []
        h = TDNNBlock(cfg.channels[0], cfg.kernel_sizes[0], cfg.dilations[0],
                      cfg.groups[0], name="block_0")(x, training)
        feats.append(h)
        for i in range(1, len(cfg.channels) - 1):
            h = SERes2NetBlock(cfg.channels[i], cfg.res2net_scale,
                               cfg.se_channels, cfg.kernel_sizes[i],
                               cfg.dilations[i], cfg.groups[i],
                               name=f"block_{i}")(h, training)
            feats.append(h)

        h = jnp.concatenate(feats[1:], axis=-1)
        h = TDNNBlock(cfg.channels[-1], cfg.kernel_sizes[-1],
                      cfg.dilations[-1], cfg.groups[-1], name="mfa")(h, training)

        if cfg.pooling:
            h = AttentiveStatisticsPooling(
                cfg.attention_channels, cfg.global_context, name="asp")(
                    h, training)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             name="asp_bn")(h)

        z = nn.Dense(out_size, name="fc")(h)

        if cfg.use_tanh:
            z = jnp.tanh(z)
        if cfg.spherical_normalisation:
            z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)

        if cfg.regularisation == "vae":
            mean, scale = jnp.split(z, 2, axis=-1)
            std = jax.nn.softplus(scale) + 1e-4
            var = std * std
            noise_rng = rng if rng is not None else self.make_rng("sample")
            z = mean + std * jax.random.normal(noise_rng, mean.shape)
            kl = jnp.mean(jnp.sum(mean * mean + var - jnp.log(var) - 1, -1))
            return z, mean, kl
        elif cfg.regularisation == "ac":
            kl = jnp.mean(nn.relu(jnp.abs(z) - 1))
            return z, z, kl
        return z, z, jnp.asarray(0.0)

    def encode(self, x, training: bool = False):
        z, _, _ = self(x, training)
        return z
