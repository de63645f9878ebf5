"""Structure encoder / adversarial classifier — TPU rebuild of Encoder1D.

Reference: /root/reference/after/diffusion/networks/encoder.py:117 (Encoder1D,
V2ConvBlock1D, V2EncoderBlock1D, LinearEncoder).

A causal cached-conv stack (frame-rate-preserving for the structure encoder,
downsampling for the classifier) with BatchNorm + SiLU + weight-normed convs,
and a pluggable reparametrisation (ac / vae / mmd) whose regulariser feeds the
diffusion trainer.  Streaming uses the ops.conv cache mechanism; BatchNorm
always runs on running statistics outside training.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Encoder1DConfig
from ..ops.conv import StreamConv1d, StreamConvTranspose1d
from ..ops.fsq import FSQ


class V2ConvBlock1D(nn.Module):
    """BN -> SiLU -> conv -> BN -> SiLU -> dropout -> conv, residual add
    (encoder.py:26-71)."""

    out_c: int
    kernel_size: int
    mode: str
    dropout: float = 0.15
    streaming: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        res = x
        # momentum 0.9 matches torch BatchNorm1d's default adaptation rate
        # (torch momentum 0.1 == flax momentum 0.9)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9, name="bn1")(x)
        h = nn.silu(h)
        h = StreamConv1d(self.out_c, self.kernel_size, mode=self.mode,
                         streaming=self.streaming, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9, name="bn2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = StreamConv1d(self.out_c, self.kernel_size, mode=self.mode,
                         streaming=self.streaming, name="conv2")(h)
        return h + res


class V2EncoderBlock1D(nn.Module):
    """Conv block + strided pool conv (encoder.py:75-113)."""

    out_c: int
    kernel_size: int
    ratio: int
    mode: str
    dropout: float = 0.15
    streaming: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_c = x.shape[-1]
        h = V2ConvBlock1D(in_c, self.kernel_size, self.mode, self.dropout,
                          self.streaming, name="conv")(x, training)
        if self.ratio != 1:
            h = StreamConv1d(self.out_c, 2 * self.ratio, stride=self.ratio,
                             mode=self.mode, streaming=self.streaming,
                             name="pool")(h)
        else:
            h = StreamConv1d(self.out_c, 1, mode="valid",
                             streaming=False, name="pool")(h)
        return h


class Encoder1D(nn.Module):
    """(B, T, in_size) -> (B, T/prod(ratios), channels[-1]) structure codes.

    `__call__` returns (z, mean, reg_loss) mirroring return_full=True
    (encoder.py:274-298); use `encode` for the plain output.
    """

    cfg: Encoder1DConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False,
                 rng: Optional[jax.Array] = None):
        cfg = self.cfg
        mode = "causal" if cfg.causal else "centered"
        channels = list(cfg.channels)
        if cfg.upscale_out:
            channels[-1] = channels[-1] * 4
        if cfg.vae_regularisation:
            channels[-1] = channels[-1] * 2
        ratios = [1] + list(cfg.ratios)

        h = V2EncoderBlock1D(channels[0], cfg.kernel_size, ratios[0], mode,
                             cfg.dropout, self.streaming, name="block_0")(
                                 x, training)
        for i in range(1, len(channels)):
            r = ratios[i] if i < len(ratios) else 1
            h = V2EncoderBlock1D(channels[i], cfg.kernel_size, r, mode,
                                 cfg.dropout, self.streaming,
                                 name=f"block_{i}")(h, training)
        h = V2ConvBlock1D(channels[-1], cfg.kernel_size, mode, cfg.dropout,
                          self.streaming, name="out_block")(h, training)

        if cfg.average_out:
            h = jnp.mean(h, axis=1)

        if cfg.spherical_normalization:
            h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-5)
        elif cfg.use_tanh:
            h = jnp.tanh(h)

        # reparametrise (encoder.py:249-271); channel dim is last in our layout
        if cfg.vae_regularisation:
            mean, scale = jnp.split(h, 2, axis=-1)
            std = jax.nn.softplus(scale) + 1e-4
            var = std * std
            logvar = jnp.log(var)
            noise_rng = rng if rng is not None else self.make_rng("sample")
            z = mean + std * jax.random.normal(noise_rng, mean.shape)
            kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1, axis=-1))
        elif cfg.ac_regularisation:
            z, mean = h, h
            kl = jnp.mean(nn.relu(jnp.abs(h) - 1))
        else:
            z, mean, kl = h, h, jnp.asarray(0.0)

        # optional FSQ bottleneck after the reparametrisation
        # (encoder.py:129,289-290: vector_quantizer applied to the codes)
        if cfg.quantizer_levels:
            fsq = FSQ(cfg.quantizer_levels, cfg.quantizer_noise_dropout)
            assert len(cfg.quantizer_levels) == z.shape[-1], \
                (cfg.quantizer_levels, z.shape)
            q_rng = None
            if training and cfg.quantizer_noise_dropout > 0:
                # with vae_regularisation the incoming rng already seeded the
                # reparam noise above — fold_in so the FSQ dropout masks are
                # an independent stream, not a correlated replay
                q_rng = (jax.random.fold_in(rng, 1) if rng is not None
                         else self.make_rng("sample"))
            z = fsq.quantize(z, q_rng)

        # upscale_out: transpose-conv chain back to frame rate, applied
        # AFTER reparametrisation + quantization as the reference does
        # (encoder.py:286-292: reparametrize -> vector_quantizer ->
        # upscaler), so the bottleneck sits at the latent rate
        if cfg.upscale_out:
            c = z.shape[-1]
            total_ratio = 1
            for r in ratios:
                total_ratio *= r
            for i in range(max(total_ratio // 2, 0)):
                z = StreamConvTranspose1d(c, 4, 2, streaming=self.streaming,
                                          name=f"upscale_up_{i}")(z)
                z = StreamConv1d(c, cfg.kernel_size, mode=mode,
                                 streaming=self.streaming,
                                 name=f"upscale_conv_{i}")(z)
            z = StreamConv1d(c // 4, cfg.kernel_size, mode=mode,
                             streaming=self.streaming, name="upscale_out")(z)
        return z, mean, kl

    def encode(self, x, training: bool = False):
        z, _, _ = self(x, training)
        return z


class LinearEncoder(nn.Module):
    """MLP encoder over pooled features (encoder.py:339-435)."""

    in_size: int = 512
    channels: Tuple[int, ...] = (512, 1024, 1024, 256, 8)
    drop_out: float = 0.15
    use_tanh: bool = False
    regularisation: str = "none"

    @nn.compact
    def __call__(self, x, training: bool = False):
        channels = list(self.channels)
        if self.regularisation == "vae":
            channels[-1] = channels[-1] * 2
        h = nn.Dense(channels[0])(x)
        for i in range(len(channels) - 1):
            h = nn.silu(h)
            h = nn.Dropout(self.drop_out, deterministic=not training)(h)
            h = nn.Dense(channels[i + 1])(h)
        if self.use_tanh:
            h = jnp.tanh(h)

        if self.regularisation == "vae":
            mean, scale = jnp.split(h, 2, axis=-1)
            std = jax.nn.softplus(scale) + 1e-4
            var = std * std
            z = mean + std * jax.random.normal(self.make_rng("sample"),
                                               mean.shape)
            kl = jnp.mean(jnp.sum(mean * mean + var - jnp.log(var) - 1, -1))
            return z, mean, kl
        elif self.regularisation == "ac":
            kl = jnp.mean(1 + nn.relu(jnp.abs(h) - 1))
            return h, h, kl
        return h, h, jnp.asarray(0.0)
