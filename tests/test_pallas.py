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
