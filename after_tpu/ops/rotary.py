"""Rotary position embeddings with cached-key offsets.

Reference: /root/reference/after/diffusion/networks/rotary_embedding.py (a
TorchScript fork of rotary_embedding_torch).  Key property used by streaming
generation: `rotate_queries_with_cached_keys` offsets query positions by
(k_len - q_len) so absolute phases stay consistent as the KV cache grows
(rotary_embedding.py:215-236).

Only the first `rot_dim` features of each head are rotated (the reference
constructs RotaryEmbedding(32) against head_dim 64); pairs are interleaved
(x0,x1), (x2,x3), ... as in rotary_embedding_torch.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _freqs(rot_dim: int, theta: float = 10000.0) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))


def rotary_angles(positions: np.ndarray, rot_dim: int,
                  theta: float = 10000.0) -> np.ndarray:
    """(T,) positions -> (T, rot_dim) angles, each freq repeated per pair."""
    f = _freqs(rot_dim, theta)
    ang = positions[:, None] * f[None, :]            # (T, rot_dim/2)
    return np.repeat(ang, 2, axis=-1).astype(np.float32)   # (T, rot_dim)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved pair rotation: (x0, x1) -> (-x1, x0)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding to (..., T, head_dim) given (T, rot_dim) angles.

    Features beyond rot_dim pass through unchanged.  cos/sin run at the
    angles' precision (f32 host constants) and are applied at x's dtype so a
    bf16 attention stack is not upcast.
    """
    rot_dim = angles.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    cos = jnp.cos(angles).astype(x.dtype)
    sin = jnp.sin(angles).astype(x.dtype)
    x_rot = x_rot * cos + _rotate_half(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)


def rotate_q_with_cached_k(q: jnp.ndarray, k: jnp.ndarray, rot_dim: int,
                           offset: int = 0, theta: float = 10000.0):
    """Rotate (.., q_len, d) queries and (.., k_len, d) keys with aligned phases.

    Queries sit at positions [k_len - q_len + offset, k_len + offset); keys at
    [0, k_len) — matching the reference's streaming convention.
    """
    q_len, k_len = q.shape[-2], k.shape[-2]
    q_pos = np.arange(k_len - q_len + offset, k_len + offset, dtype=np.float64)
    k_pos = np.arange(k_len, dtype=np.float64)
    q_ang = jnp.asarray(rotary_angles(q_pos, rot_dim, theta))
    k_ang = jnp.asarray(rotary_angles(k_pos, rot_dim, theta))
    return apply_rotary(q, q_ang), apply_rotary(k, k_ang)
