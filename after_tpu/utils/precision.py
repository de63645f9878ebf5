"""Mixed-precision helpers.

Inference in bfloat16 runs the matmul/conv hot path on the MXU at twice the
f32 throughput with half the HBM traffic; attention logits and Euler state
stay in f32 (see models/denoiser.py: preferred_element_type, and
rectified_flow.sample: the carry is kept at the caller's dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point array leaf of `tree` to `dtype`;
    leave ints/bools (e.g. stream-state counters) untouched."""

    def c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(c, tree)


def resolve_dtype(name):
    """'bfloat16'/'float32'/None (or a dtype) -> jnp dtype or None."""
    if name is None or name == "":
        return None
    if isinstance(name, str):
        name = {"bf16": "bfloat16", "f32": "float32",
                "fp32": "float32"}.get(name, name)
        return jnp.dtype(name).type
    return name
