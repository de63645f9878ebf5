"""Rectified-flow + pipeline tests: loss, CFG drop, scan sampler, streaming
sampler == offline sampler on causal models, full transfer graph."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import (AfterConfig, AutoEncoderConfig, DenoiserConfig,
                              ECAPAConfig, Encoder1DConfig, get_config,
                              with_overrides)
from after_tpu.diffusion import RectifiedFlow, TransferPipeline
from after_tpu.streaming import init_stream_state


def micro_config() -> AfterConfig:
    cfg = get_config("tiny")
    cfg = with_overrides(cfg, {
        "denoiser.embed_dim": 64,
        "denoiser.n_layers": 2,
        "denoiser.noise_embed_dims": 16,
        "denoiser.mlp_multiplier": 2,
        "encoder.channels": (16, 16, 16, 32),
        "encoder_time.channels": (16, 16, 16, 16, 12),
        "classifier.channels": (16, 16, 16, 16, 6),
        "train.n_signal": 32,
        "autoencoder.pqmf_bands": 4,
        "autoencoder.z_channels": 8,
        "autoencoder.base_channels": 8,
        "autoencoder.multipliers": (1, 2, 2),
        "autoencoder.factors": (2, 2),
        "autoencoder.dilations": (1, 3),
        "autoencoder.num_blocks_per_stage": 1,
    })
    return cfg.resolved(in_size=8, n_signal=32)


@pytest.mark.slow
def test_diffusion_loss_and_grad():
    cfg = micro_config()
    rf = RectifiedFlow(cfg)
    variables = rf.init(jax.random.PRNGKey(0))
    B, T, C = 2, 32, 8
    x1 = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    tcond = jnp.zeros((B, T, cfg.zs_channels))
    cond = jnp.zeros((B, cfg.zt_channels))

    def loss_fn(p):
        loss, _ = rf.diffusion_loss(p, jax.random.PRNGKey(2), x1, tcond, cond)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["net"])
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert float(gnorm) > 0


def test_cfgdrop_semantics():
    cfg = micro_config()
    rf = RectifiedFlow(cfg)
    B = 1000
    cond = jnp.ones((B, 6))
    tcond = jnp.ones((B, 32, 12))
    dropped = rf.cfgdrop(jax.random.PRNGKey(0), [cond, tcond],
                         drop_targets=(0, 1), drop_rate=0.2)
    # cond rows are either fully kept or fully dropped to drop_value
    c = np.asarray(dropped[0])
    assert set(np.unique(c)).issubset({1.0, cfg.drop_value})
    frac_drop = (c[:, 0] == cfg.drop_value).mean()
    # expected drop prob for target 0: P(draw<0.2) + P(0.4<draw<0.6) = 0.4
    assert 0.3 < frac_drop < 0.5


def test_sampler_runs_and_is_deterministic():
    cfg = micro_config()
    rf = RectifiedFlow(cfg)
    variables = rf.init(jax.random.PRNGKey(0))
    B, T, C = 1, 32, 8
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    cond = jnp.zeros((B, cfg.zt_channels))
    tcond = jnp.zeros((B, T, cfg.zs_channels))
    y1 = rf.sample(variables["net"], x0, cond, tcond, 4, 2.0, 1.0)
    y2 = rf.sample(variables["net"], x0, cond, tcond, 4, 2.0, 1.0)
    assert y1.shape == x0.shape
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_streaming_sampler_equals_offline():
    """Chunk-by-chunk streaming generation must equal offline generation of
    the same latent sequence (causal model, per-step KV caches)."""
    cfg = micro_config()
    rf = RectifiedFlow(cfg)
    variables = rf.init(jax.random.PRNGKey(0))
    B, T, C = 1, 32, 8
    nb_steps = 3
    chunk = cfg.denoiser.attention_chunk_size
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.zt_channels))
    tcond = jax.random.normal(jax.random.PRNGKey(3), (B, T, cfg.zs_channels))

    y_off = rf.sample(variables["net"], x0, cond, tcond, nb_steps, 1.5, 1.0)

    cache = init_stream_state(
        rf.net_stream, jnp.zeros((3 * B, chunk, C)), jnp.zeros((3 * B,)),
        jnp.zeros((3 * B, cfg.zt_channels)),
        jnp.zeros((3 * B, chunk, cfg.zs_channels)))
    outs = []
    for i in range(0, T, chunk):
        y, cache = rf.sample_stream(
            variables["net"], cache, x0[:, i:i + chunk], cond,
            tcond[:, i:i + chunk], nb_steps, 1.5, 1.0)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=5e-4)


@pytest.mark.slow
def test_full_transfer_pipeline():
    cfg = micro_config()
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    T = cfg.train.n_signal * cfg.autoencoder.ratio
    a1 = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1)) * 0.1
    a2 = jax.random.normal(jax.random.PRNGKey(2), (1, T, 1)) * 0.1
    out = pipe.transfer(variables, a1, a2, 2)
    assert out.ndim == 3 and out.shape[0] == 1 and out.shape[2] == 1
    assert np.isfinite(np.asarray(out)).all()
