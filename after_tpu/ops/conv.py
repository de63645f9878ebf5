"""Streaming-aware 1-D convolutions — the TPU substrate replacing `cached_conv`.

The reference's real-time path is built on cached causal convolutions
(/root/reference: SimpleNetsStream.py:12, encoder.py:3) where every
``cc.Conv1d`` hides a left-context ring buffer inside the module and a
``cumulative_delay`` integer is threaded through the graph to re-align
residual branches (``cc.AlignBranches``).

Here the same semantics are purely functional and TPU-first:

- data layout is (batch, time, channels) so channels ride the TPU lane dim;
- offline mode left/right-pads statically and lets XLA fuse;
- streaming mode is ``apply(..., mutable=['cache'])``: the left context is an
  explicit ``cache`` collection entry, so a streaming step is an ordinary
  jittable pure function ``(params, cache, x) -> (y, cache)``;
- delay bookkeeping is *static metadata computed at trace time*
  (:func:`conv_delay`), not a runtime attribute.

Padding rule (matches cached_conv.get_padding semantics so layer geometry is
identical to the reference):
    total = (kernel - 1) * dilation + 1 - stride
    causal   -> (total, 0)           zero delay
    centered -> (ceil, floor)        delay = right/stride output frames
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_padding(kernel_size: int, stride: int = 1, dilation: int = 1,
                mode: str = "centered") -> Tuple[int, int]:
    """Left/right padding that keeps out_len = in_len // stride."""
    total = (kernel_size - 1) * dilation + 1 - stride
    total = max(total, 0)
    if mode == "causal":
        return (total, 0)
    elif mode == "centered":
        left = (total + 1) // 2
        return (left, total - left)
    raise ValueError(f"unknown padding mode {mode!r}")


def conv_delay(kernel_size: int, stride: int = 1, dilation: int = 1,
               mode: str = "centered", in_delay: int = 0) -> int:
    """Cumulative streaming delay (in output frames) after this conv.

    A streamed centered conv is computed causally, so its output lags the
    offline centered output by ``right_pad`` input frames.  This mirrors the
    reference's ``cumulative_delay`` chain (cached_conv), but is evaluated
    symbolically at model-build time.
    """
    _, right = get_padding(kernel_size, stride, dilation, mode)
    return (in_delay + right) // stride


class StreamConv1d(nn.Module):
    """1-D conv over (B, T, C) with optional weight-norm and streaming cache.

    Offline: pads according to `mode` and runs one fused conv.
    Streaming (``streaming=True`` + ``mutable=['cache']``): keeps the trailing
    ``left+right`` input frames in the cache so that successive chunk calls
    exactly reproduce the offline causal output (centered mode streams with a
    static delay of ``right`` frames, reported by :func:`conv_delay`).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    mode: str = "causal"                 # "causal" | "centered" | "valid"
    use_bias: bool = True
    use_weight_norm: bool = True
    groups: int = 1
    streaming: bool = False
    param_dtype: jnp.dtype = jnp.float32

    def _fusable(self, x, snake) -> bool:
        """The Pallas fused snake+conv covers the offline stride-1 f32 case
        with tileable shapes; everything else takes the lax path."""
        if snake is None or self.streaming or self.stride != 1 \
                or self.groups != 1:
            return False
        if self.mode == "valid" and self.kernel_size > 1:
            return False  # kernel always emits out_len == in_len
        from . import pallas as ops_pallas
        if not ops_pallas.enabled():
            return False
        T, O = x.shape[1], self.features
        t_tile = min(256, T)
        if T % t_tile != 0 or t_tile % 8 != 0:
            return False
        if O > 512 and O % 256 != 0:
            return False
        # manual HBM->VMEM DMA: lane dim must sit on the (8,128) tiling.
        # Mosaic-only constraint — the interpreter (CPU tests) has no lane
        # tiling, so small-channel test codecs still exercise the kernel.
        if not ops_pallas.interpret_mode() and x.shape[-1] % 128 != 0:
            return False
        return x.dtype == jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 snake: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        """With ``snake=(alpha, beta)``, computes conv(snake_beta(x)) —
        fused into one Pallas kernel on TPU, or unfused on fallback."""
        in_features = x.shape[-1]
        kshape = (self.kernel_size, in_features // self.groups, self.features)
        # Kaiming-uniform fan_in init, matching torch Conv1d default so
        # training dynamics start from the same scale.
        fan_in = self.kernel_size * in_features // self.groups
        bound = float(1.0 / np.sqrt(fan_in))
        kernel = self.param(
            "kernel", lambda key: jax.random.uniform(key, kshape, self.param_dtype,
                                                     -bound, bound))
        if self.use_weight_norm:
            # torch weight_norm(dim=0): per-output-channel magnitude g over (in, k).
            g = self.param(
                "g", lambda key: jnp.linalg.norm(
                    kernel.reshape(-1, self.features), axis=0))
            norm = jnp.linalg.norm(kernel.reshape(-1, self.features), axis=0)
            kernel = kernel * (g / jnp.maximum(norm, 1e-12))

        bias = (self.param("bias",
                           lambda key: jax.random.uniform(key, (self.features,),
                                                          self.param_dtype,
                                                          -bound, bound))
                if self.use_bias else None)

        if snake is not None:
            if self._fusable(x, snake):
                from . import pallas as ops_pallas
                return ops_pallas.fused_snake_causal_conv(
                    x, snake[0], snake[1], kernel,
                    bias if bias is not None
                    else jnp.zeros((self.features,), x.dtype),
                    dilation=self.dilation, mode=self.mode,
                    interpret=ops_pallas.interpret_mode())
            from .snake import snake_beta
            x = snake_beta(x, snake[0], snake[1])

        # raw lax.conv does not auto-promote like flax Dense; bring x and
        # kernel to a common dtype (no-op in pure-f32 or pure-bf16 graphs)
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if bias is not None:
            bias = bias.astype(dtype)

        if self.mode == "valid":
            left = right = 0
        else:
            left, right = get_padding(self.kernel_size, self.stride,
                                      self.dilation, self.mode)

        if self.streaming and self.mode != "valid":
            context = left + right
            cache = self.variable(
                "cache", "carry",
                lambda: jnp.zeros((x.shape[0], context, in_features), x.dtype))
            x_full = jnp.concatenate([cache.value, x], axis=1)
            if context > 0:
                cache.value = x_full[:, -context:]
            y = jax.lax.conv_general_dilated(
                x_full, kernel,
                window_strides=(self.stride,),
                padding="VALID",
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=(self.stride,),
                padding=[(left, right)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups)

        if bias is not None:
            y = y + bias
        return y

    def delay(self, in_delay: int = 0) -> int:
        return conv_delay(self.kernel_size, self.stride, self.dilation,
                          self.mode, in_delay)


# lax.conv_transpose lowers on TPU via input dilation: a stride-1 conv over
# a signal with f-1 zeros inserted between frames, wasting (f-1)/f of the
# MACs on zeros unless XLA strength-reduces it.  The subpixel form computes
# the same outputs as two dense einsums (x @ W_phase -> (T, f, C_out) blocks
# overlap-added and reshaped) — pure MXU matmuls, zero waste.  Exact same
# math modulo float reduction order; toggle for A/B.
_MATMUL_UPSAMPLE = True


def use_matmul_upsample(enable: bool) -> None:
    """Globally toggle the subpixel-matmul transpose-conv path."""
    global _MATMUL_UPSAMPLE
    _MATMUL_UPSAMPLE = enable


def _subpixel_conv_transpose(x: jnp.ndarray, kernel: jnp.ndarray,
                             stride: int) -> jnp.ndarray:
    """Un-trimmed VALID transpose conv for kernel_size == 2*stride as two
    phase matmuls + overlap-add; equals lax.conv_transpose(..., "VALID")
    with the same (k, in, out) kernel (which applies the kernel flipped:
    y[t] = sum_j x[j] @ k[K-1-(t - f*j)])."""
    f = stride
    B, T, _ = x.shape
    Cout = kernel.shape[-1]
    wf = kernel[::-1]                                   # flip once, host-free
    a = jnp.einsum("btc,pco->btpo", x, wf[:f])          # phases 0..f-1
    b = jnp.einsum("btc,pco->btpo", x, wf[f:])          # phases f..2f-1
    blocks = (jnp.pad(a, ((0, 0), (0, 1), (0, 0), (0, 0)))
              + jnp.pad(b, ((0, 0), (1, 0), (0, 0), (0, 0))))
    return blocks.reshape(B, (T + 1) * f, Cout)


class StreamConvTranspose1d(nn.Module):
    """Transposed 1-D conv (upsampler) over (B, T, C) with streaming overlap-add.

    Offline matches torch ``ConvTranspose1d(kernel=2f, stride=f, padding=f//2)``
    (reference Upsample1d, SimpleNetsStream.py:51-70): out_len = in_len * f.
    Streaming keeps the un-emitted overlap tail as cache and emits causally
    (delay f - f//2 output samples relative to the centered offline output).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    use_weight_norm: bool = True
    streaming: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        # torch ConvTranspose1d weight is (in, out, k); fan_in for init = out*k?
        # torch uses fan_in = in_channels * kernel_size here as well.
        kshape = (self.kernel_size, in_features, self.features)
        fan_in = self.kernel_size * in_features
        bound = float(1.0 / np.sqrt(fan_in))
        kernel = self.param(
            "kernel", lambda key: jax.random.uniform(key, kshape, self.param_dtype,
                                                     -bound, bound))
        if self.use_weight_norm:
            # torch weight_norm(dim=0) on (in, out, k) -> per-*input*-channel g.
            g = self.param(
                "g", lambda key: jnp.linalg.norm(
                    kernel.transpose(1, 0, 2).reshape(in_features, -1), axis=1))
            norm = jnp.linalg.norm(
                kernel.transpose(1, 0, 2).reshape(in_features, -1), axis=1)
            scale = (g / jnp.maximum(norm, 1e-12))[None, :, None]
            kernel = kernel * scale

        bias = (self.param("bias",
                           lambda key: jax.random.uniform(
                               key, (self.features,), self.param_dtype,
                               -bound, bound))
                if self.use_bias else None)

        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if bias is not None:
            bias = bias.astype(dtype)

        # Full (un-trimmed) transposed conv: length in*f + (k - f).
        if _MATMUL_UPSAMPLE and self.kernel_size == 2 * self.stride:
            y = _subpixel_conv_transpose(x, kernel, self.stride)
        else:
            y = jax.lax.conv_transpose(
                x, kernel,
                strides=(self.stride,),
                padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))

        tail = self.kernel_size - self.stride   # overlap length
        if self.streaming:
            cache = self.variable(
                "cache", "overlap",
                lambda: jnp.zeros((x.shape[0], tail, self.features), y.dtype))
            if tail > 0:
                y = y.at[:, :tail].add(cache.value)
                cache.value = y[:, -tail:]
                y = y[:, :-tail]
        else:
            # Centered trim: torch ConvTranspose1d(padding=f//2) removes f//2
            # frames from each side of the un-trimmed output (reference
            # Upsample1d uses kernel=2f, stride=f, padding=f//2).
            pad = self.stride // 2
            total = x.shape[1] * self.stride
            y = jax.lax.dynamic_slice_in_dim(y, pad, total, axis=1)

        if bias is not None:
            y = y + bias
        return y

    def delay(self, in_delay: int = 0) -> int:
        # Streamed output lags the centered offline output by `pad` frames,
        # and upstream delay is multiplied by the upsampling factor.
        return in_delay * self.stride + self.stride // 2
