"""1-D conv UNet denoiser (alternative backbone).

Reference: /root/reference/after/diffusion/networks/unet1d.py:255 (UNET1D
with ConvBlock1D FiLM time/cond modulation :100-108 and a parallel
downsampled time_cond pyramid :296-313).  Gin-selectable in the reference but
not used by shipped configs; provided here for backbone parity.
Layout (B, T, C); convs are plain centered (this backbone is offline-only).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def spe(t: jnp.ndarray, dim: int, max_positions: float = 10000.0,
        scale: float = 32.0) -> jnp.ndarray:
    """Sinusoidal position embedding (unet1d.py:7-26: [sin | cos])."""
    t = t.reshape(-1) * scale
    half = dim // 2
    w = (1.0 / max_positions) ** (2 * jnp.arange(half) / dim)
    ang = t[:, None] * w[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class ConvBlock1D(nn.Module):
    """GN -> SiLU -> conv -> FiLM(time) -> FiLM(cond) -> GN -> SiLU -> conv,
    residual (unet1d.py:31-117)."""

    out_c: int
    kernel_size: int
    cond_channels: int = 0
    res: bool = True

    @nn.compact
    def __call__(self, x, time_emb, skip=None, cond=None, time_cond=None):
        res = x
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        if time_cond is not None:
            x = jnp.concatenate([x, time_cond], axis=-1)

        in_c = x.shape[-1]
        g1 = min(16, in_c // 4)
        if g1 > 0 and in_c % g1 == 0:
            x = nn.GroupNorm(num_groups=g1, name="gn1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_c, (self.kernel_size,), padding="SAME",
                    name="conv1")(x)

        tm = nn.Dense(128, name="time_mlp1")(time_emb)
        tm = nn.Dense(2 * self.out_c, name="time_mlp2")(nn.silu(tm))
        mult, add = jnp.split(tm, 2, axis=-1)
        x = x * mult[:, None] + add[:, None]

        if self.cond_channels > 0 and cond is not None:
            cm = nn.Dense(128, name="cond_mlp1")(cond)
            cm = nn.Dense(2 * self.out_c, name="cond_mlp2")(nn.silu(cm))
            mult, add = jnp.split(cm, 2, axis=-1)
            x = x * mult[:, None] + add[:, None]

        g2 = min(16, self.out_c // 4)
        if g2 > 0 and self.out_c % g2 == 0:
            x = nn.GroupNorm(num_groups=g2, name="gn2")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_c, (self.kernel_size,), padding="SAME",
                    name="conv2")(x)

        if self.res:
            if skip is not None:
                res = nn.Conv(self.out_c, (1,), name="to_out")(res)
            if res.shape[-1] == x.shape[-1]:
                x = x + res
        return x


@dataclasses.dataclass(frozen=True)
class UNet1DConfig:
    in_size: int = 64
    out_size: Optional[int] = None
    channels: Tuple[int, ...] = (128, 128, 256, 256)
    ratios: Tuple[int, ...] = (2, 2, 2, 2)
    kernel_size: int = 5
    time_channels: int = 64
    time_cond_in_channels: int = 12
    time_cond_channels: int = 64
    cond_channels: int = 6


class UNet1D(nn.Module):
    cfg: UNet1DConfig

    @nn.compact
    def __call__(self, x, time, cond=None, time_cond=None,
                 deterministic: bool = True):
        # `deterministic` accepted for denoiser-slot interface parity
        # (this backbone has no dropout).
        cfg = self.cfg
        out_size = cfg.out_size or cfg.in_size
        n = len(cfg.channels)
        ratios = [1] + list(cfg.ratios)
        time_emb = spe(time, cfg.time_channels)

        # time_cond pyramid (unet1d.py:296-313)
        tcs = []
        tc = None
        if cfg.time_cond_channels and time_cond is not None:
            tc = nn.Conv(cfg.time_cond_channels, (cfg.kernel_size,),
                         padding="SAME", name="tcond_in")(time_cond)
            tc = nn.silu(tc)

        skips = []
        h = x
        for i in range(n):
            # tc pyramid lags the pooling by one level so that tc always
            # matches x's length at each block (unet1d.py:296-313)
            if tc is not None and i > 0:
                tc = nn.Conv(cfg.time_cond_channels, (cfg.kernel_size,),
                             strides=(ratios[i - 1],), padding="SAME",
                             name=f"tcond_{i}")(tc)
                tc = nn.silu(tc)
            skip = ConvBlock1D(h.shape[-1], cfg.kernel_size,
                               cfg.cond_channels,
                               name=f"down_conv_{i}")(
                                   h, time_emb, cond=cond, time_cond=tc)
            tcs.append(tc)
            skips.append(skip)
            r = ratios[i]
            h = nn.Conv(cfg.channels[i], (cfg.kernel_size,),
                        strides=(r,), padding="SAME",
                        name=f"down_pool_{i}")(skip)

        if tc is not None:
            tc = nn.Conv(cfg.time_cond_channels, (cfg.kernel_size,),
                         strides=(ratios[n - 1],), padding="SAME",
                         name="tcond_mid")(tc)
            tc = nn.silu(tc)
        h = ConvBlock1D(cfg.channels[-1], cfg.kernel_size, cfg.cond_channels,
                        name="middle")(h, time_emb, cond=cond, time_cond=tc)

        for i in reversed(range(n)):
            r = ratios[i]
            if r > 1:
                h = jnp.repeat(h, r, axis=1)
            out_c = cfg.channels[i - 1] if i > 0 else out_size
            h = nn.Conv(out_c, (3,), padding="SAME", name=f"up_conv_{i}")(h)
            h = ConvBlock1D(out_c, cfg.kernel_size, cfg.cond_channels,
                            res=i > 0, name=f"up_block_{i}")(
                                h, time_emb, skip=skips[i], cond=cond,
                                time_cond=tcs[i])
        return h
