"""Pallas TPU kernel: fused SnakeBeta + causal dilated conv1d.

The codec's inner loop is ResnetBlock1d = [GN] -> snake -> conv(k,d) ->
snake -> conv(1) -> +res (models/autoencoder.py).  XLA materialises the
snake activation to HBM between convs at large T; this kernel computes

    y[t, o] = sum_{j<k} snake(x[t + j*d])[c] * W[j, c, o] + b[o]

per (batch, time-tile, out-tile) grid cell with the input window DMA'd into
VMEM once: the activation is recomputed on the fly (cheap VPU work) and the
tap-sum runs as k MXU matmuls over the channel dim.  Overlapping time
windows (the causal left context) are handled with manual HBM->VMEM copies
since blocked BlockSpecs cannot overlap.

Correctness is pinned to the lax path in tests/test_pallas.py.  The codec
routes ConvBlock1d through this kernel when
``AutoEncoderConfig.fused_kernels`` is set and ``ops.pallas.enabled()``
(StreamConv1d falls back to the lax path for shapes/modes the kernel does
not cover: streaming, strides, groups, non-f32, ragged or lane-unaligned
tiles).  Measured on a real v5e (scripts/bench_pallas_ab.py, batch-16
base-codec decode): XLA's own conv fusion is 1.45x FASTER than this kernel,
so ``fused_kernels`` defaults to off — the kernel is kept as a correct,
Mosaic-aligned template for ops XLA fuses poorly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, alpha_ref, beta_ref, w_ref, b_ref, o_ref, *,
            k: int, dilation: int, t_tile: int, pad: int, buf_pad: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    def body(xbuf, sem):
        # DMA window length is `pad` rounded up to the (8,128) sublane tile
        # (Mosaic: HBM memref slices must be 8-aligned along dim 1)
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * t_tile, t_tile + buf_pad), :], xbuf, sem)
        dma.start()
        dma.wait()
        x = xbuf[:]
        alpha = alpha_ref[0, :]
        beta = beta_ref[0, :]
        a = x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))
        acc = jnp.zeros((t_tile, o_ref.shape[2]), jnp.float32)
        for j in range(k):
            off = j * dilation
            acc += jnp.dot(a[off:off + t_tile, :], w_ref[j],
                           preferred_element_type=jnp.float32)
        o_ref[0, :, :] = acc + b_ref[0, :]

    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((t_tile + buf_pad, x_hbm.shape[2]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA)


def fused_snake_causal_conv(x: jnp.ndarray, alpha: jnp.ndarray,
                            beta: jnp.ndarray, w: jnp.ndarray,
                            b: jnp.ndarray, dilation: int = 1,
                            t_tile: int = 256, mode: str = "causal",
                            interpret: bool = False) -> jnp.ndarray:
    """y = conv(snake_beta(x)); x (B,T,C), w (k,C,O) -> (B,T,O).

    mode "causal" pads all left context; "centered" splits the pad as
    ops.conv.get_padding does.  snake(0) == 0, so activating the zero pad
    equals padding the activation (bit-identical to the unfused path).

    Differentiable: the forward runs the Pallas kernel, the backward is the
    lax reference's VJP (pallas_call has no transpose rule of its own), so
    fused_kernels=True is safe under training, not just inference."""
    return _fused_with_vjp(dilation, t_tile, mode, interpret)(
        x, alpha, beta, w, b)


@functools.lru_cache(maxsize=None)
def _fused_with_vjp(dilation: int, t_tile: int, mode: str, interpret: bool):
    @jax.custom_vjp
    def f(x, alpha, beta, w, b):
        return _pallas_forward(x, alpha, beta, w, b, dilation, t_tile, mode,
                               interpret)

    def fwd(x, alpha, beta, w, b):
        return f(x, alpha, beta, w, b), (x, alpha, beta, w, b)

    def bwd(res, g):
        x, alpha, beta, w, b = res
        _, vjp = jax.vjp(
            lambda *args: reference_snake_conv(*args, dilation=dilation,
                                               mode=mode),
            x, alpha, beta, w, b)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _pallas_forward(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                    w: jnp.ndarray, b: jnp.ndarray, dilation: int,
                    t_tile: int, mode: str, interpret: bool) -> jnp.ndarray:
    B, T, C = x.shape
    k, _, O = w.shape
    pad = (k - 1) * dilation
    if mode == "causal" or pad == 0:
        left, right = pad, 0
    else:  # centered
        left = (pad + 1) // 2
        right = pad - left
    t_tile = min(t_tile, T)
    assert T % t_tile == 0, (T, t_tile)
    assert t_tile % 8 == 0, t_tile  # DMA start must sit on a sublane tile
    o_tile = O if O <= 512 else 256
    assert O % o_tile == 0

    # round the context window up to the 8-row sublane tile so the manual
    # HBM slice is aligned (extra rows are DMA'd but never read by compute)
    buf_pad = -(-pad // 8) * 8
    xp = jnp.pad(x, ((0, 0), (left, right + (buf_pad - pad)), (0, 0)))
    grid = (B, T // t_tile, O // o_tile)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dilation=dilation, t_tile=t_tile,
                          pad=pad, buf_pad=buf_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, T + buf_pad, C), lambda bi, ti, oi: (0, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((1, C), lambda bi, ti, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, ti, oi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C, o_tile), lambda bi, ti, oi: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_tile), lambda bi, ti, oi: (0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, o_tile),
                               lambda bi, ti, oi: (bi, ti, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, O), jnp.float32),
        interpret=interpret,
    )(xp, alpha.reshape(1, C), beta.reshape(1, C), w, b.reshape(1, O))
    return out


def reference_snake_conv(x, alpha, beta, w, b, dilation=1, mode="causal"):
    """lax reference implementation (tests, CPU fallback, and the backward
    pass of the custom VJP)."""
    a = x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))
    k = w.shape[0]
    pad = (k - 1) * dilation
    if mode == "causal" or pad == 0:
        left, right = pad, 0
    else:
        left = (pad + 1) // 2
        right = pad - left
    y = jax.lax.conv_general_dilated(
        a, w, (1,), [(left, right)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + b


def reference_snake_causal_conv(x, alpha, beta, w, b, dilation=1):
    return reference_snake_conv(x, alpha, beta, w, b, dilation, "causal")
