"""Streaming state utilities.

All streaming state in after_tpu (conv left-contexts, transpose-conv overlap
tails, KV caches, timbre ring buffers) lives in the flax ``cache`` variable
collection: a plain pytree of arrays threaded through jitted step functions as
``(params, cache, x) -> (y, cache)``.  This replaces the reference's hidden
registered buffers inside nn_tilde modules (SURVEY §5.7).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def zero_cache(cache: Dict[str, Any]) -> Dict[str, Any]:
    """Reset every streaming buffer to zeros (fresh stream)."""
    return jax.tree_util.tree_map(jnp.zeros_like, cache)


def init_stream_state(module, *example_args, method=None, **kwargs):
    """Build a zeroed streaming cache for `module` given example inputs.

    flax's ``init`` runs the forward pass, which advances cache contents; this
    helper re-zeros them so a stream always starts from silence.  The whole
    init runs under jit: eager init would issue one backend compile per op,
    which is pathologically slow on remote-compile TPU backends.
    """

    def go():
        variables = module.init({"params": jax.random.PRNGKey(0)},
                                *example_args, method=method, **kwargs)
        return zero_cache(variables.get("cache", {}))

    return jax.jit(go)()
