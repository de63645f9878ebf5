"""Pallas kernel correctness vs the lax reference path (interpret mode on the
CPU test mesh; the compiled path runs on TPU in bench/production)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.ops.pallas import (fused_snake_causal_conv,
                                  reference_snake_causal_conv)


@pytest.mark.parametrize("k,d,C,O", [(3, 1, 64, 64), (3, 9, 64, 128),
                                     (1, 1, 128, 128)])
def test_fused_snake_conv_matches_reference(k, d, C, O):
    rng = np.random.RandomState(0)
    B, T = 2, 512
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    alpha = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    w = jnp.asarray((rng.randn(k, C, O) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(O).astype(np.float32))

    y_ref = reference_snake_causal_conv(x, alpha, beta, w, b, d)
    y = fused_snake_causal_conv(x, alpha, beta, w, b, d, t_tile=256,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


@pytest.mark.slow
def test_codec_fused_kernels_route_and_match(monkeypatch):
    """fused_kernels=True routes ConvBlock1d snake+conv through the Pallas
    kernel (interpret mode on CPU) and matches the unfused codec; without
    the gate it silently falls back to the identical lax path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from after_tpu.config import AutoEncoderConfig
    from after_tpu.models import AudioCodec

    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1,
                            bottleneck="relu", bottleneck_sigma=0.0)
    cfg_f = dataclasses.replace(cfg, fused_kernels=True)
    codec = AudioCodec(cfg)
    codec_f = AudioCodec(cfg_f)

    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 1))
    variables = codec.init(jax.random.PRNGKey(1), x)

    y0, *_ = codec.apply(variables, x)

    # CPU without the interpret flag: gate off -> exact fallback
    monkeypatch.delenv("AFTER_TPU_PALLAS_INTERPRET", raising=False)
    y_fb, *_ = codec_f.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_fb), np.asarray(y0))

    # interpret mode: the Pallas kernel actually runs
    monkeypatch.setenv("AFTER_TPU_PALLAS_INTERPRET", "1")
    y_k, *_ = codec_f.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y0), atol=2e-5)


def test_fused_conv_gradients_match_reference():
    """fused_kernels must be trainable: the custom VJP (lax backward behind
    the Pallas forward) matches the reference gradients."""
    from after_tpu.ops.pallas import reference_snake_conv

    rng = np.random.RandomState(1)
    B, T, C, O, k, d = 2, 64, 16, 16, 3, 1
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    alpha = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    w = jnp.asarray((rng.randn(k, C, O) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(O).astype(np.float32))

    def loss_fused(x, w, b):
        return jnp.sum(jnp.square(fused_snake_causal_conv(
            x, alpha, beta, w, b, d, t_tile=32, interpret=True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.square(reference_snake_conv(
            x, alpha, beta, w, b, dilation=d)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a_, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-3)


def test_fused_conv_centered_mode():
    """The generalised kernel matches the lax path for centered padding."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, T, C, O, k, d = 2, 256, 16, 32, 3, 3
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    alpha = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    w = jnp.asarray(0.1 * rng.randn(k, C, O).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(O).astype(np.float32))

    from after_tpu.ops.pallas import fused_snake_causal_conv

    y = fused_snake_causal_conv(x, alpha, beta, w, b, dilation=d,
                                mode="centered", interpret=True)
    a = x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))
    pad = (k - 1) * d
    left = (pad + 1) // 2
    y_ref = jax.lax.conv_general_dilated(
        a, w, (1,), [(left, pad - left)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC")) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
