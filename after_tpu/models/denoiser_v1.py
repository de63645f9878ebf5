"""Legacy Denoiser v1 — cross-attention structure conditioning and per-frame
(temporal) noise levels.

Reference: /root/reference/after/diffusion/networks/transformer.py:555
(Denoiser, CrossAttention :233, MLPSepConv :278, temporal-noise path
:629-655).  Differences from DenoiserV2 (models/denoiser.py):

- `tcond_mode="cross_attention"`: structure codes attend as keys/values of a
  per-block cross-attention instead of AdaLN modulation;
- `temporal_noise=True`: a per-frame noise level is Fourier-embedded and
  concatenated to the structure codes; the global embedding then carries only
  the timbre vector;
- patchify uses LayerNorm instead of GELU (transformer.py:444-448);
- optional depthwise-separable-conv MLP (`mlp_type="sep_conv"`).

Streaming (`streaming=True`) mirrors the reference's per-diffusion-step KV
caches (transformer.py:92-163): self-attention caches roll-write exactly as
DenoiserV2's, and the cross-attention keeps the same window cache over past
structure-code keys/values (the reference routes CrossAttention through the
same MHAttention cache, transformer.py:233-260).  As in the reference, the
learnable `pos_embed_ca` indexes the *current chunk* positions in streaming
(transformer.py:535-539), so offline==stream holds exactly when that
embedding is zero (or the window covers the sequence).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DenoiserConfig
from ..ops.masks import mask_bias, sliding_chunkwise_mask, streaming_mask
from ..ops.rotary import apply_rotary, rotary_angles
from .denoiser import fourier_features


@dataclasses.dataclass(frozen=True)
class DenoiserV1Config:
    base: DenoiserConfig = dataclasses.field(default_factory=DenoiserConfig)
    tcond_mode: str = "cross_attention"       # "cross_attention" | "adaln"
    temporal_noise: bool = False
    mlp_type: str = "mlp"                     # "mlp" | "sep_conv"
    # The reference's offline cross-attention is non-causal
    # (transformer.py:233, is_causal=False): earlier frames attend *future*
    # structure codes, so its streaming (which can only see the past window)
    # silently mismatches training.  cross_attn_causal=True applies the same
    # chunkwise-causal window to cross-attention offline, making
    # stream == offline exact — train with it if the model will be streamed.
    cross_attn_causal: bool = False


class _Attention(nn.Module):
    """Shared masked multi-head attention over given q/k/v projections.

    With `streaming=True`, keys/values concatenate a per-diffusion-step
    window cache (roll-written, `filled`-masked) exactly like DenoiserV2's
    ChunkCausalAttention — for cross-attention too, matching the reference's
    shared MHAttention cache (transformer.py:92-163)."""

    cfg: DenoiserConfig
    causal_mask: bool = True
    streaming: bool = False

    @nn.compact
    def __call__(self, q, k, v, cache_index=0, deterministic: bool = True):
        cfg = self.cfg
        B, Tq, E = q.shape
        H = E // cfg.head_dim
        D = cfg.head_dim

        def heads(y):
            return y.reshape(B, -1, H, D).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        if self.streaming:
            T = k.shape[2]
            C = cfg.local_attention_size
            S = cfg.max_diffusion_steps
            k_cache = self.variable(
                "cache", "k", lambda: jnp.zeros((B, S, H, C, D), q.dtype))
            v_cache = self.variable(
                "cache", "v", lambda: jnp.zeros((B, S, H, C, D), q.dtype))
            filled = self.variable(
                "cache", "filled", lambda: jnp.zeros((S,), jnp.int32))

            kc = jnp.take(k_cache.value, cache_index, axis=1)
            vc = jnp.take(v_cache.value, cache_index, axis=1)
            full_k = jnp.concatenate([kc, k], axis=2)
            full_v = jnp.concatenate([vc, v], axis=2)

            new_kc = (jnp.concatenate([kc[:, :, T:], k[:, :, :min(T, C)]],
                                      axis=2) if T < C else k[:, :, -C:])
            new_vc = (jnp.concatenate([vc[:, :, T:], v[:, :, :min(T, C)]],
                                      axis=2) if T < C else v[:, :, -C:])
            k_cache.value = jax.lax.dynamic_update_index_in_dim(
                k_cache.value, new_kc, cache_index, axis=1)
            v_cache.value = jax.lax.dynamic_update_index_in_dim(
                v_cache.value, new_vc, cache_index, axis=1)
            n_filled = jnp.take(filled.value, cache_index)
            filled.value = filled.value.at[cache_index].set(
                jnp.minimum(n_filled + T, C))

            KL = C + T
            if self.causal_mask and cfg.causal:
                bias = jnp.asarray(mask_bias(streaming_mask(
                    Tq, KL, cfg.attention_chunk_size,
                    cfg.local_attention_size)))
            else:
                bias = jnp.zeros((Tq, KL), jnp.float32)
            key_idx = jnp.arange(KL)
            valid = key_idx >= (C - n_filled)
            bias = jnp.where(valid[None, :], bias, -1e9)
        else:
            full_k, full_v = k, v
            if self.causal_mask and cfg.causal:
                bias = jnp.asarray(mask_bias(sliding_chunkwise_mask(
                    full_k.shape[2], cfg.attention_chunk_size,
                    cfg.local_attention_size)))[-Tq:]
            else:
                bias = None

        if cfg.pos_emb_type == "rotary":
            k_len = full_k.shape[2]
            q_ang = jnp.asarray(rotary_angles(
                np.arange(k_len - Tq, k_len, dtype=np.float64),
                cfg.rotary_dim))
            k_ang = jnp.asarray(rotary_angles(
                np.arange(k_len, dtype=np.float64), cfg.rotary_dim))
            q = apply_rotary(q, q_ang)
            full_k = apply_rotary(full_k, k_ang)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, full_k,
                            preferred_element_type=jnp.float32) / np.sqrt(D)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(full_v.dtype)
        if cfg.dropout > 0 and not deterministic:
            probs = nn.Dropout(cfg.dropout, deterministic=False)(probs)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, full_v)
        return out.transpose(0, 2, 1, 3).reshape(B, Tq, E)


class SepConvMLP(nn.Module):
    """Depthwise-separable conv MLP (LocalViT-style, transformer.py:278)."""

    embed_dim: int
    mlp_multiplier: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hid = self.mlp_multiplier * self.embed_dim
        h = nn.Dense(hid)(x)
        # reference MLPSepConv builds the depthwise conv with KERNEL SIZE 1
        # (transformer.py:289-295) — a per-channel scale+bias.  A wider
        # kernel would read neighbouring frames, breaking causality and the
        # stream==offline invariant.
        h = nn.Conv(hid, (1,), feature_group_count=hid)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim)(h)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)


class DecoderBlockV1(nn.Module):
    cfg: DenoiserV1Config
    streaming: bool = False

    @nn.compact
    def __call__(self, x, cond, tcond, cache_index=0,
                 deterministic: bool = True):
        base = self.cfg.base
        use_ca = (self.cfg.tcond_mode == "cross_attention"
                  and tcond is not None)

        if tcond is not None and not use_ca:
            x = nn.LayerNorm(use_bias=False, use_scale=False, name="norm0")(x)
            ab = nn.Dense(2 * base.embed_dim, name="tcond_linear")(tcond)
            alpha, beta = jnp.split(ab, 2, axis=-1)
            x = x * (1 + alpha) + beta

        h = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * base.embed_dim, use_bias=False, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = _Attention(base, streaming=self.streaming,
                       name="self_attn")(q, k, v, cache_index,
                                         deterministic) + x

        # AdaLN cond — v1 normalises unconditionally (transformer.py:402-406)
        x = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        if cond is not None:
            ab = nn.Dense(2 * base.embed_dim, name="cond_linear")(cond)
            alpha, beta = jnp.split(ab, 2, axis=-1)
            if alpha.ndim == 2:
                alpha, beta = alpha[:, None], beta[:, None]
            x = x * (1 + alpha) + beta

        if use_ca:
            h = nn.LayerNorm(name="norm4")(x)
            q = nn.Dense(base.embed_dim, use_bias=False, name="q_linear")(h)
            kv = nn.Dense(2 * base.embed_dim, use_bias=False,
                          name="kv_linear")(tcond)
            k, v = jnp.split(kv, 2, axis=-1)
            x = _Attention(base, causal_mask=self.cfg.cross_attn_causal,
                           streaming=self.streaming,
                           name="cross_attn")(q, k, v, cache_index,
                                              deterministic) + x

        h = nn.LayerNorm(name="norm3")(x)
        if self.cfg.mlp_type == "sep_conv":
            x = SepConvMLP(base.embed_dim, base.mlp_multiplier, base.dropout,
                           name="mlp")(h, deterministic) + x
        else:
            from .denoiser import MLP
            x = MLP(base.embed_dim, base.mlp_multiplier, base.dropout,
                    name="mlp")(h, deterministic) + x
        return x


class DenoiserV1(nn.Module):
    cfg: DenoiserV1Config
    streaming: bool = False

    @nn.compact
    def __call__(self, x, time, cond=None, time_cond=None, cache_index=0,
                 deterministic: bool = True):
        cfg = self.cfg
        base = cfg.base
        B, T, _ = x.shape

        if cfg.temporal_noise:
            if time.ndim == 1 or time.shape[-1] == 1:
                time = jnp.broadcast_to(time.reshape(B, 1), (B, T))
            tnl = fourier_features(time.reshape(-1), base.noise_embed_dims)
            tnl = tnl.reshape(B, T, base.noise_embed_dims)
            features = (nn.Sequential([
                nn.Dense(base.embed_dim),
                lambda h: nn.gelu(h, approximate=False),
                nn.Dense(base.embed_dim)])(cond)
                if cond is not None else None)
            tcond_in = (jnp.concatenate([time_cond, tnl], axis=-1)
                        if time_cond is not None else tnl)
        else:
            noise_level = fourier_features(time, base.noise_embed_dims)
            emb_in = (jnp.concatenate([noise_level, cond], axis=-1)
                      if cond is not None else noise_level)
            features = nn.Sequential([
                nn.Dense(base.embed_dim),
                lambda h: nn.gelu(h, approximate=False),
                nn.Dense(base.embed_dim)])(emb_in)
            tcond_in = time_cond

        h = nn.Dense(base.embed_dim, name="patchify")(x)
        h = nn.LayerNorm(name="patchify_norm")(h)

        if base.pos_emb_type == "learnable":
            if self.streaming:
                raise ValueError("streaming DenoiserV1 requires rotary or no "
                                 "positional embedding (learnable restarts "
                                 "every chunk)")
            pos = self.param("pos_embed", nn.initializers.normal(1.0),
                             (base.seq_len, base.embed_dim))
            h = h + pos[None, :T]

        tc = None
        if tcond_in is not None:
            if cfg.tcond_mode == "cross_attention":
                tc = nn.Dense(base.embed_dim, name="tcond_patchify")(tcond_in)
                tc = nn.LayerNorm(name="tcond_norm")(tc)
                pos_ca = self.param("pos_embed_ca",
                                    nn.initializers.normal(1.0),
                                    (base.seq_len, base.embed_dim))
                tc = tc + pos_ca[None, :tc.shape[1]]
            else:
                d = tcond_in.shape[-1]
                tc = nn.Dense(d, name="tcond_patchify")(tcond_in)
                tc = nn.LayerNorm(name="tcond_norm")(tc)

        for i in range(base.n_layers):
            h = DecoderBlockV1(cfg, streaming=self.streaming,
                               name=f"block_{i}")(h, features, tc,
                                                  cache_index, deterministic)
        return nn.Dense(base.n_channels, name="out_proj")(h)
