"""DiT-style chunk-wise causal denoiser — TPU rebuild of DenoiserV2.

Reference: /root/reference/after/diffusion/networks/transformerv2.py:461
(DenoiserV2 / DenoiserTransBlock / DecoderBlock / SelfAttention / MHAttention).

TPU-first redesign:
- data layout (B, T, C) end-to-end (no rearranges; channels ride lanes);
- the chunk-wise sliding-window mask is a host-precomputed constant
  (after_tpu.ops.masks), fixing the reference's per-call Python mask builder
  (transformerv2.py:206-218);
- streaming KV caches are explicit `cache` collection arrays shaped
  (batch, max_diffusion_steps, heads, cache_len, head_dim) — one slot per
  diffusion step (transformerv2.py:147-155) — updated with static-shape
  roll-writes so the whole k-step sampler fuses into one lax.scan;
- a per-(batch, step) `filled` counter masks not-yet-written cache slots, so
  stream == offline holds from the very first frame (the reference attends
  to zero-padded cache during warm-up and never verifies equivalence).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DenoiserConfig
from ..ops.masks import mask_bias, sliding_chunkwise_mask, streaming_mask
from ..ops.rotary import apply_rotary, rotary_angles


def fourier_features(t: jnp.ndarray, num_channels: int,
                     max_positions: float = 10_000.0,
                     factor: float = 100.0) -> jnp.ndarray:
    """Noise-level embedding (reference PositionalEmbedding, transformerv2.py:13).

    t: (B,) scalar times in [0, 1] -> (B, num_channels) [cos | sin] features.
    The trig runs in f32 for accuracy; the result is returned at t's dtype so
    a bf16 graph stays bf16 (no silent upcast through the AdaLN modulations).
    """
    out_dtype = t.dtype
    t = t.reshape(-1).astype(jnp.float32) * factor
    half = num_channels // 2
    freqs = jnp.arange(half, dtype=jnp.float32) / half
    freqs = (1.0 / max_positions) ** freqs
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)],
                           axis=-1).astype(out_dtype)


class MLP(nn.Module):
    embed_dim: int
    mlp_multiplier: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.mlp_multiplier * self.embed_dim)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.embed_dim)(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class ChunkCausalAttention(nn.Module):
    """Multi-head attention with chunk-wise causal sliding-window masking and
    per-diffusion-step streaming KV caches."""

    cfg: DenoiserConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache_index=0,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        B, T, E = x.shape
        H = E // cfg.head_dim
        D = cfg.head_dim

        qkv = nn.Dense(3 * E, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(y):
            return y.reshape(B, T, H, D).transpose(0, 2, 1, 3)  # B H T D

        q, k, v = heads(q), heads(k), heads(v)

        if self.streaming:
            C = cfg.local_attention_size
            S = cfg.max_diffusion_steps
            k_cache = self.variable(
                "cache", "k", lambda: jnp.zeros((B, S, H, C, D), x.dtype))
            v_cache = self.variable(
                "cache", "v", lambda: jnp.zeros((B, S, H, C, D), x.dtype))
            filled = self.variable(
                "cache", "filled", lambda: jnp.zeros((S,), jnp.int32))

            kc = jnp.take(k_cache.value, cache_index, axis=1)   # B H C D
            vc = jnp.take(v_cache.value, cache_index, axis=1)
            full_k = jnp.concatenate([kc, k], axis=2)           # B H C+T D
            full_v = jnp.concatenate([vc, v], axis=2)

            # roll-write: shift this step's cache left by T, append new keys
            new_kc = jnp.concatenate([kc[:, :, T:], k[:, :, :min(T, C)]], axis=2) \
                if T < C else k[:, :, -C:]
            new_vc = jnp.concatenate([vc[:, :, T:], v[:, :, :min(T, C)]], axis=2) \
                if T < C else v[:, :, -C:]
            k_cache.value = jax.lax.dynamic_update_index_in_dim(
                k_cache.value, new_kc, cache_index, axis=1)
            v_cache.value = jax.lax.dynamic_update_index_in_dim(
                v_cache.value, new_vc, cache_index, axis=1)
            n_filled = jnp.take(filled.value, cache_index)
            filled.value = filled.value.at[cache_index].set(
                jnp.minimum(n_filled + T, C))

            KL = C + T
            bias = jnp.asarray(mask_bias(streaming_mask(
                T, KL, cfg.attention_chunk_size, cfg.local_attention_size)))
            # mask cache slots that have not been written yet
            key_idx = jnp.arange(KL)
            valid = key_idx >= (C - n_filled)
            bias = jnp.where(valid[None, :], bias, -1e9)
        else:
            full_k, full_v = k, v
            if cfg.causal:
                bias = jnp.asarray(mask_bias(sliding_chunkwise_mask(
                    T, cfg.attention_chunk_size, cfg.local_attention_size)))
            else:
                bias = None

        if cfg.pos_emb_type == "rotary":
            q_len, k_len = q.shape[2], full_k.shape[2]
            q_ang = jnp.asarray(rotary_angles(
                np.arange(k_len - q_len, k_len, dtype=np.float64),
                cfg.rotary_dim))
            k_ang = jnp.asarray(rotary_angles(
                np.arange(k_len, dtype=np.float64), cfg.rotary_dim))
            q = apply_rotary(q, q_ang)
            full_k = apply_rotary(full_k, k_ang)

        scale = 1.0 / np.sqrt(D)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, full_k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        if cfg.dropout > 0 and not deterministic:
            probs = nn.Dropout(cfg.dropout, deterministic=False)(probs)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, full_v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        return out


class DecoderBlock(nn.Module):
    """AdaLN(tcond) -> self-attn + res -> AdaLN(cond) -> MLP + res
    (reference DecoderBlock, transformerv2.py:299-362; note that the AdaLN
    modulations *replace* x rather than being residual branches)."""

    cfg: DenoiserConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, x, cond: Optional[jnp.ndarray],
                 tcond: Optional[jnp.ndarray], cache_index=0,
                 deterministic: bool = True):
        cfg = self.cfg
        if cfg.tcond_dim > 0 and tcond is not None:
            x = nn.LayerNorm(use_bias=False, use_scale=False, name="norm0")(x)
            ab = nn.Dense(2 * cfg.embed_dim, name="tcond_linear")(tcond)
            alpha, beta = jnp.split(ab, 2, axis=-1)
            x = x * (1 + alpha) + beta

        h = nn.LayerNorm(name="norm1")(x)
        x = ChunkCausalAttention(cfg, streaming=self.streaming,
                                 name="attn")(h, cache_index, deterministic) + x

        if cond is not None:
            x = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
            ab = nn.Dense(2 * cfg.embed_dim, name="cond_linear")(cond)
            alpha, beta = jnp.split(ab, 2, axis=-1)
            x = x * (1 + alpha[:, None]) + beta[:, None]

        h = nn.LayerNorm(name="norm3")(x)
        x = MLP(cfg.embed_dim, cfg.mlp_multiplier, cfg.dropout,
                name="mlp")(h, deterministic) + x
        return x


class _ScanBlockBody(nn.Module):
    """nn.scan body: one DecoderBlock as (carry, broadcast...) -> (carry, None)."""

    cfg: DenoiserConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, h, cond, tcond, cache_index, deterministic):
        h = DecoderBlock(self.cfg, streaming=self.streaming,
                         name="block")(h, cond, tcond, cache_index,
                                       deterministic)
        return h, None


def stack_block_params(params, n_layers: int):
    """Convert loop-form denoiser params (block_0..block_{n-1}) into the
    scan form (`blocks/block` with a leading layer axis), e.g. after
    utils.port_torch.map_denoiser_v2."""
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    blocks = [params[f"block_{i}"] for i in range(n_layers)]
    out["blocks"] = {"block": jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks)}
    return out


class Denoiser(nn.Module):
    """Rectified-flow velocity field v(x_t, t, z_timbre, z_structure).

    Offline: full (B, T, C) sequence, static chunk-causal mask.
    Streaming (`streaming=True`): (B, chunk, C) steps with per-diffusion-step
    KV caches in the `cache` collection; pass `cache_index` = Euler step.
    """

    cfg: DenoiserConfig
    streaming: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 cond: Optional[jnp.ndarray] = None,
                 time_cond: Optional[jnp.ndarray] = None,
                 cache_index=0, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg

        noise_level = fourier_features(time, cfg.noise_embed_dims)

        if cfg.cond_dim > 0 and cond is not None:
            emb_in = jnp.concatenate([noise_level, cond], axis=-1)
            features = nn.Dense(cfg.embed_dim, name="emb_dense1")(emb_in)
            features = nn.gelu(features, approximate=False)
            features = nn.Dense(cfg.embed_dim, name="emb_dense2")(features)
        else:
            features = None

        h = nn.Dense(cfg.embed_dim, name="patchify")(x)
        h = nn.gelu(h, approximate=False)

        if cfg.pos_emb_type == "learnable":
            if self.streaming:
                # each chunk would restart at position 0 against a KV cache
                # holding earlier absolute positions -> stream != offline
                # (rotary re-phases cached keys; learnable cannot).  Same
                # guard as DenoiserV1.
                raise ValueError(
                    "pos_emb_type='learnable' is not streamable; use "
                    "'rotary' for streaming models")
            pos = self.param("pos_embed", nn.initializers.normal(1.0),
                             (cfg.seq_len, cfg.embed_dim))
            h = h + pos[None, :h.shape[1]]

        if cfg.tcond_dim > 0 and time_cond is not None:
            tc = nn.Dense(cfg.tcond_dim, name="tcond_patchify")(time_cond)
            tc = nn.gelu(tc, approximate=False)
        else:
            tc = None

        if cfg.scan_layers:
            # one traced block, scanned over stacked params: ~n_layers x
            # smaller XLA graph, identical math to the unrolled loop
            ScanBlocks = nn.scan(
                _ScanBlockBody,
                variable_axes={"params": 0, "cache": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=cfg.n_layers)
            h, _ = ScanBlocks(cfg, self.streaming, name="blocks")(
                h, features, tc, cache_index, deterministic)
        else:
            for i in range(cfg.n_layers):
                h = DecoderBlock(cfg, streaming=self.streaming,
                                 name=f"block_{i}")(h, features, tc,
                                                    cache_index,
                                                    deterministic)

        return nn.Dense(cfg.n_channels, name="out_proj")(h)
