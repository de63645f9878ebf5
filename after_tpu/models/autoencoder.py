"""Streamable multiband audio codec — TPU rebuild of the RAVE-style AutoEncoder.

Reference: /root/reference/after/autoencoder/networks/SimpleNetsStream.py:832
(AutoEncoder / Encoder1d / Decoder1d / DownsampleBlock1d / UpsampleBlock1d /
ResnetBlock1d / ConvBlock1d / bottlenecks / NoiseGenerator).

Pipeline: waveform (B, T, 1) --PQMF--> bands (B, T/M, M) --conv encoder-->
latents (B, T/ratio, z) --bottleneck--> z --conv decoder--> bands --inverse
PQMF--> waveform.  All convs honour the `causal` config for streaming export;
delay bookkeeping is static metadata.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import AutoEncoderConfig
from ..ops.conv import StreamConv1d, StreamConvTranspose1d
from ..ops.pqmf import PQMFAnalysis, PQMFSynthesis
from ..ops.snake import SnakeBeta


class StreamGroupNorm(nn.Module):
    """GroupNorm with a streaming past-context pad buffer.

    Reference CachedGroupNorm (SimpleNetsStream.py:96-147): in stream mode the
    incoming chunk is normalised together with a ring buffer of the previous
    chunk's samples, approximating the offline statistics.  Offline it is a
    plain GroupNorm.
    """

    num_groups: int
    streaming: bool = False

    @nn.compact
    def __call__(self, x):
        # epsilon matches torch nn.GroupNorm (1e-5; flax defaults to 1e-6)
        gn = nn.GroupNorm(num_groups=min(x.shape[-1], self.num_groups),
                          epsilon=1e-5, name="gn")
        if not self.streaming:
            return gn(x)
        pad = self.variable(
            "cache", "pad",
            lambda: jnp.zeros((x.shape[0], x.shape[1], x.shape[-1]), x.dtype))
        full = jnp.concatenate([pad.value, x], axis=1)
        pad.value = full[:, -x.shape[1]:]
        return gn(full)[:, -x.shape[1]:]


class GRU(nn.Module):
    """Optional recurrent layer (SimpleNetsStream.py:788-816): multi-layer GRU
    over latent frames + weight-normed 1x1-ish conv out."""

    out_size: int
    hidden_size: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, carry=None):
        B = x.shape[0]
        cells = [nn.GRUCell(self.hidden_size, name=f"gru_{i}")
                 for i in range(self.num_layers)]
        if carry is None:
            carry = [jnp.zeros((B, self.hidden_size)) for _ in cells]

        def step(carries, xt):
            new_c = []
            h = xt
            for c, cell in zip(carries, cells):
                c2, h = cell(c, h)
                new_c.append(c2)
            return new_c, h

        carry, hs = jax.lax.scan(step, carry, x.transpose(1, 0, 2))
        h = hs.transpose(1, 0, 2)
        y = StreamConv1d(self.out_size, 3, mode="centered", name="to_out")(h)
        return y, carry


class ConvBlock1d(nn.Module):
    """[GroupNorm] -> SnakeBeta -> weight-normed conv (SimpleNetsStream.py:150)."""

    out_c: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True
    mode: str = "centered"
    streaming: bool = False
    fused: bool = False       # route snake+conv through the Pallas kernel

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = x
        if self.use_norm:
            # streaming may be the "norm" sentinel: GroupNorm streams (pad
            # buffer stats) while convs run offline/windowed — the
            # reference's non-causal streaming mode (CachedGroupNorm.stream
            # bound True with use_cached_conv False,
            # export_autoencoder.py:291-312)
            h = StreamGroupNorm(self.num_groups,
                                streaming=bool(self.streaming),
                                name="gn")(h)
        act = SnakeBeta(in_c, name="act")
        conv = StreamConv1d(self.out_c, self.kernel_size, stride=self.stride,
                            dilation=self.dilation, mode=self.mode,
                            streaming=self.streaming is True, name="conv")
        if self.fused and not self.streaming:
            # one VMEM-resident pass on TPU; StreamConv1d falls back to the
            # unfused lax path when the kernel does not cover the shape
            return conv(h, snake=act())
        return conv(act(h))


class ResnetBlock1d(nn.Module):
    """conv(k,d) -> conv(1); residual through 1x1 if channels change
    (SimpleNetsStream.py:197)."""

    out_c: int
    kernel_size: int = 3
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True
    use_res: bool = True
    mode: str = "centered"
    streaming: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = ConvBlock1d(self.out_c, self.kernel_size, 1, self.dilation,
                        self.num_groups, self.use_norm, self.mode,
                        self.streaming, self.fused, name="block1")(x)
        h = ConvBlock1d(self.out_c, 1, 1, 1, self.num_groups, self.use_norm,
                        self.mode, self.streaming, self.fused,
                        name="block2")(h)
        if not self.use_res:
            return h
        res = x
        if in_c != self.out_c:
            res = StreamConv1d(self.out_c, 1, mode="valid",
                               name="to_out")(res)
        return h + res


class DownsampleBlock1d(nn.Module):
    """N resnet blocks -> activation -> strided downsample conv
    (SimpleNetsStream.py:301)."""

    out_c: int
    factor: int
    num_layers: int
    dilations: Sequence[int]
    kernel_size: int
    num_groups: int
    use_norm: bool
    mode: str
    streaming: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = x
        for i in range(self.num_layers):
            h = ResnetBlock1d(in_c, self.kernel_size, self.dilations[i],
                              self.num_groups, self.use_norm, True, self.mode,
                              self.streaming, self.fused,
                              name=f"res_{i}")(h)
        h = SnakeBeta(in_c, name="act")(h)
        h = StreamConv1d(self.out_c, 2 * self.factor, stride=self.factor,
                         mode=self.mode, streaming=self.streaming is True,
                         name="down")(h)
        return h


class UpsampleBlock1d(nn.Module):
    """activation -> transpose-conv upsample -> N resnet blocks
    (SimpleNetsStream.py:344)."""

    out_c: int
    factor: int
    num_layers: int
    dilations: Sequence[int]
    kernel_size: int
    num_groups: int
    use_norm: bool
    mode: str
    streaming: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = SnakeBeta(in_c, name="act")(x)
        h = StreamConvTranspose1d(self.out_c, 2 * self.factor, self.factor,
                                  streaming=self.streaming is True,
                                  name="up")(h)
        for i in range(self.num_layers):
            h = ResnetBlock1d(self.out_c, self.kernel_size, self.dilations[i],
                              self.num_groups, self.use_norm, True, self.mode,
                              self.streaming, self.fused,
                              name=f"res_{i}")(h)
        return h


class CodecEncoder(nn.Module):
    """Band signals (B, Tb, M) -> latents (B, Tb/prod(factors), z)."""

    cfg: AutoEncoderConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, xb):
        cfg = self.cfg
        mode = "causal" if cfg.causal else "centered"
        ch = cfg.base_channels
        num_blocks = cfg.num_blocks_per_stage
        out_channels = cfg.z_channels * (2 if cfg.bottleneck == "vae" else 1)

        fused = cfg.fused_kernels
        h = ResnetBlock1d(ch * cfg.multipliers[0], cfg.kernel_size, 1,
                          cfg.resnet_groups, cfg.use_norm, True, mode,
                          self.streaming, fused, name="to_in")(xb)
        for i, f in enumerate(cfg.factors):
            h = DownsampleBlock1d(ch * cfg.multipliers[i + 1], f, num_blocks,
                                  cfg.dilations, cfg.kernel_size,
                                  cfg.resnet_groups, cfg.use_norm, mode,
                                  self.streaming, fused,
                                  name=f"down_{i}")(h)
        h = SnakeBeta(ch * cfg.multipliers[-1], name="act")(h)
        h = StreamConv1d(out_channels, 3, mode=mode,
                         streaming=self.streaming is True,
                         name="to_out")(h)
        return h


class CodecDecoder(nn.Module):
    """Latents (B, Tl, z) -> band signals (B, Tl*prod(factors), M)."""

    cfg: AutoEncoderConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        mode = "causal" if cfg.causal else "centered"
        ch = cfg.base_channels
        mults = [int(m * cfg.decoder_ratio) for m in cfg.multipliers[::-1]]
        factors = cfg.factors[::-1]
        num_blocks = cfg.num_blocks_per_stage
        out_c = cfg.pqmf_bands if cfg.pqmf_bands > 1 else 1

        h = StreamConv1d(ch * mults[0], cfg.kernel_size, mode=mode,
                         streaming=self.streaming is True, name="to_in")(z)
        for i, f in enumerate(factors):
            h = UpsampleBlock1d(ch * mults[i + 1], f, num_blocks,
                                cfg.dilations, cfg.kernel_size,
                                cfg.resnet_groups, cfg.use_norm, mode,
                                self.streaming, cfg.fused_kernels,
                                name=f"up_{i}")(h)

        to_out_c = out_c * 2 if cfg.use_loudness else out_c
        feats = h
        h = ResnetBlock1d(to_out_c, cfg.kernel_size, 1, cfg.resnet_groups,
                          cfg.use_norm, False, mode, self.streaming,
                          cfg.fused_kernels, name="to_out")(h)

        if cfg.use_loudness:
            y, amp = jnp.split(h, 2, axis=-1)
            h = y * nn.sigmoid(amp)

        if cfg.use_noise:
            rng = self.make_rng("noise") if self.has_rng("noise") else \
                jax.random.PRNGKey(0)
            h = h + NoiseGenerator(out_c, mode=mode,
                                   streaming=self.streaming is True,
                                   name="noise")(feats, rng)
        return h


def decoder_band_delay(cfg: AutoEncoderConfig) -> int:
    """Streaming delay (band-rate frames) of the causal decoder vs the
    centered offline decoder: each transpose-conv upsample contributes
    factor//2 frames at its output rate (ops.conv.StreamConvTranspose1d
    delay rule); causal convs contribute zero."""
    d = 0
    for f in cfg.factors[::-1]:
        d = d * f + f // 2
    return d


def mod_sigmoid(x):
    """core.py:7: 2*sigmoid(x)^2.3 + 1e-7."""
    return 2 * jnp.power(nn.sigmoid(x), 2.3) + 1e-7


def amp_to_impulse_response(amp: jnp.ndarray, target_size: int) -> jnp.ndarray:
    """Frequency amplitudes -> windowed impulse response on the last axis
    (SimpleNetsStream.py:462-483)."""
    ir = jnp.fft.irfft(amp.astype(jnp.complex64), axis=-1)
    filter_size = ir.shape[-1]
    ir = jnp.roll(ir, filter_size // 2, axis=-1)
    win = jnp.hanning(filter_size)
    ir = ir * win
    ir = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, target_size - filter_size)])
    return jnp.roll(ir, -filter_size // 2, axis=-1)


def fft_convolve(signal: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Circular-safe FFT convolution on the last axis (SimpleNetsStream.py:486)."""
    n = signal.shape[-1]
    signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, n)])
    kernel = jnp.pad(kernel, [(0, 0)] * (kernel.ndim - 1) + [(n, 0)])
    out = jnp.fft.irfft(jnp.fft.rfft(signal) * jnp.fft.rfft(kernel))
    return out[..., out.shape[-1] // 2:]


class NoiseGenerator(nn.Module):
    """Filtered-noise synthesis branch for the decoder
    (SimpleNetsStream.py:499-549): conv stack predicts per-block noise-band
    amplitudes; noise is shaped by the derived impulse responses."""

    data_size: int
    ratios: Sequence[int] = (2, 2, 2)
    noise_bands: int = 5
    hidden_size: int = 128
    mode: str = "centered"
    streaming: bool = False

    @nn.compact
    def __call__(self, x, rng):
        channels = [self.hidden_size] * (len(self.ratios) - 1)
        channels.append(self.data_size * self.noise_bands)
        h = x
        for i, r in enumerate(self.ratios):
            h = StreamConv1d(channels[i], 3, stride=r, mode=self.mode,
                             streaming=self.streaming, name=f"conv_{i}")(h)
            if i != len(self.ratios) - 1:
                h = nn.leaky_relu(h, 0.2)
        amp = mod_sigmoid(h - 5.0)                       # (B, T/8, data*bands)
        B, Tq, _ = amp.shape
        target = 1
        for r in self.ratios:
            target *= r
        amp = amp.reshape(B, Tq, self.data_size, self.noise_bands)
        ir = amp_to_impulse_response(amp, target)
        noise = jax.random.uniform(rng, ir.shape, minval=-1.0, maxval=1.0)
        noise = fft_convolve(noise, ir)                  # (B, Tq, data, target)
        noise = noise.transpose(0, 1, 3, 2).reshape(B, Tq * target,
                                                    self.data_size)
        return noise


def relu_bottleneck_reg(z: jnp.ndarray, scale: float = 3.0) -> jnp.ndarray:
    """SimpleLatentReg: ELU(|z| - scale).mean() + 1 (core.py:189-198)."""
    return jnp.mean(nn.elu(jnp.abs(z) - scale)) + 1.0


class AudioCodec(nn.Module):
    """Full codec with PQMF wrap and bottleneck.

    encode: (B, T, 1) waveform -> (B, T/ratio, z) latents (+ reg loss)
    decode: latents -> (B, T, 1) waveform
    """

    cfg: AutoEncoderConfig
    streaming: bool = False

    def setup(self):
        self.pqmf = PQMFAnalysis(self.cfg.pqmf_attenuation,
                                 self.cfg.pqmf_bands, self.cfg.causal,
                                 self.streaming is True)
        self.pqmf_inv = PQMFSynthesis(self.cfg.pqmf_attenuation,
                                      self.cfg.pqmf_bands, self.cfg.causal,
                                      self.streaming is True,
                                      parity=decoder_band_delay(self.cfg) % 2)
        self.encoder = CodecEncoder(self.cfg, self.streaming)
        self.decoder = CodecDecoder(self.cfg, self.streaming)

    def bottleneck(self, z, rng: Optional[jax.Array] = None,
                   apply_noise: bool = False):
        cfg = self.cfg
        if cfg.bottleneck == "relu":
            reg = relu_bottleneck_reg(z, cfg.bottleneck_scale)
            if apply_noise and rng is not None:
                z = z + cfg.bottleneck_sigma * jax.random.normal(rng, z.shape)
            return z, reg
        elif cfg.bottleneck == "tanh":
            z = cfg.bottleneck_scale * jnp.tanh(z)
            if apply_noise and rng is not None:
                z = z + cfg.bottleneck_sigma * jax.random.normal(rng, z.shape)
            return z, jnp.asarray(0.0)
        elif cfg.bottleneck == "vae":
            mean, scale = jnp.split(z, 2, axis=-1)
            std = jax.nn.softplus(scale) + 1e-2
            var = std * std
            if rng is not None:
                z = mean + std * jax.random.normal(rng, mean.shape)
            else:
                z = mean
            kl = jnp.mean(jnp.sum(mean * mean + var - jnp.log(var) - 1, -1))
            return z, kl
        return z, jnp.asarray(0.0)

    def encode(self, x, rng: Optional[jax.Array] = None):
        xb = self.pqmf(x) if self.cfg.pqmf_bands > 1 else x
        z = self.encoder(xb)
        z, reg = self.bottleneck(z, rng)
        return z

    def decode(self, z):
        yb = self.decoder(z)
        y = self.pqmf_inv(yb) if self.cfg.pqmf_bands > 1 else yb
        return y

    def __call__(self, x, rng: Optional[jax.Array] = None):
        """Training forward: returns (y, y_bands, z, reg, x_bands)
        mirroring return_all=True (SimpleNetsStream.py:899-916)."""
        xb = self.pqmf(x) if self.cfg.pqmf_bands > 1 else x
        z = self.encoder(xb)
        z, reg = self.bottleneck(z, rng, apply_noise=rng is not None)
        yb = self.decoder(z)
        y = self.pqmf_inv(yb) if self.cfg.pqmf_bands > 1 else yb
        return y, yb, z, reg, xb
