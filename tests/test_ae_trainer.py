"""Codec GAN trainer integration tests (micro codec, short signals)."""

import dataclasses

import jax
import numpy as np

from after_tpu.config import (AETrainConfig, AutoEncoderConfig,
                              DiscriminatorConfig)
from after_tpu.autoencoder import AutoencoderTrainer


def micro_ae():
    ae = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                           multipliers=(1, 2, 2), factors=(2, 2),
                           dilations=(1, 3), num_blocks_per_stage=1)
    tc = AETrainConfig(num_signal=4096, warmup_steps=2,
                       update_discriminator_every=2,
                       stft_fft_sizes=(512, 128), stft_hop_sizes=(128, 32),
                       stft_win_lengths=(512, 128))
    dc = DiscriminatorConfig(filters=4, n_ffts=(206, 334),
                             hop_lengths=(103, 167), win_lengths=(206, 334))
    return ae, tc, dc


def batches(n, T=4096, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield (0.1 * rng.randn(1, T, 1)).astype(np.float32)


def test_ae_training_warmup_and_gan():
    ae, tc, dc = micro_ae()
    tr = AutoencoderTrainer(ae, tc, dc)
    state = tr.init(jax.random.PRNGKey(0), 1)
    log = []
    state = tr.fit(state, batches(6), max_steps=6,
                   callback=lambda s, m: log.append(m))
    assert state.step == 6
    # warmup steps have no GAN metrics; later steps alternate gen/disc
    assert "mrstft" in log[0] and "feature_matching" not in log[0]
    disc_steps = [m for m in log if "discriminator" in m]
    assert len(disc_steps) >= 1
    for m in log:
        for v in m.values():
            assert np.isfinite(v)


def test_ae_params_update():
    ae, tc, dc = micro_ae()
    tr = AutoencoderTrainer(ae, tc, dc)
    state = tr.init(jax.random.PRNGKey(0), 1)
    leaf0 = np.asarray(jax.tree_util.tree_leaves(
        state.codec_vars["params"])[0])
    state = tr.fit(state, batches(2), max_steps=2)
    leaf1 = np.asarray(jax.tree_util.tree_leaves(
        state.codec_vars["params"])[0])
    assert not np.allclose(leaf0, leaf1)
