"""Streamable spectral front-ends + Descript discriminator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.ops.streaming_spectral import (StreamableCQT,
                                              StreamableMelSpectrogram)
from after_tpu.streaming import init_stream_state


def test_streamable_mel_equals_offline():
    mel = StreamableMelSpectrogram(n_fft=512, hop=128, n_mels=32)
    smel = StreamableMelSpectrogram(n_fft=512, hop=128, n_mels=32,
                                    streaming=True)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, 4096, 1))
    v = mel.init(jax.random.PRNGKey(1), x)
    y_off = mel.apply(v, x)

    cache = init_stream_state(smel, x[:, :512])
    outs = []
    for i in range(0, 4096, 512):
        y, aux = smel.apply({"cache": cache}, x[:, i:i + 512],
                            mutable=["cache"])
        cache = aux["cache"]
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    # stream frames lag by the (n_fft - hop) warm-up context
    ctx_frames = (512 - 128) // 128
    a = np.asarray(y_off)[:, :-ctx_frames or None]
    b = np.asarray(y_stream)[:, ctx_frames:]
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_allclose(a[:, :n], b[:, :n], atol=1e-4)


def test_cqt_peaks_at_tone_frequency():
    sr = 22050
    cqt = StreamableCQT(sr=sr, n_bins=48, hop=512)
    t = np.arange(sr) / sr
    f0 = 440.0
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t).astype(np.float32))[None, :,
                                                                   None]
    v = cqt.init(jax.random.PRNGKey(0), x[:, :8192])
    y = cqt.apply(v, x)
    prof = np.asarray(y).mean(axis=(0, 1))
    peak_bin = prof.argmax()
    expected = int(round(12 * np.log2(f0 / 32.70)))
    assert abs(peak_bin - expected) <= 1


def test_encodec_discriminator_batched_equals_split():
    """batched=True (one [x ‖ y] pass per scale, used by disc_step) must give
    the same losses and grads as the split form the gen step uses."""
    from after_tpu.config import DiscriminatorConfig
    from after_tpu.models.discriminator import EncodecDiscriminator

    cfg = DiscriminatorConfig(filters=8, n_ffts=(128, 256),
                              hop_lengths=(64, 128), win_lengths=(128, 256))
    disc = EncodecDiscriminator(cfg)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 1))
    y = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 4096, 1))
    variables = disc.init(jax.random.PRNGKey(2), x, y)

    def dis_loss(params, batched):
        _, ld, _ = disc.apply({"params": params}, x, y, batched=batched)
        return ld

    g_split, ld_split = (jax.grad(dis_loss)(variables["params"], False),
                         dis_loss(variables["params"], False))
    g_batch, ld_batch = (jax.grad(dis_loss)(variables["params"], True),
                         dis_loss(variables["params"], True))
    np.testing.assert_allclose(float(ld_split), float(ld_batch), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_split),
            jax.tree_util.tree_leaves_with_path(g_batch)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    lg_split, _, m_split = disc.apply(variables, x, y)
    lg_batch, _, m_batch = disc.apply(variables, x, y, batched=True)
    np.testing.assert_allclose(float(lg_split), float(lg_batch), rtol=1e-5)
    np.testing.assert_allclose(float(m_split["feature_matching"]),
                               float(m_batch["feature_matching"]), rtol=1e-5)


@pytest.mark.slow
def test_descript_discriminator():
    from after_tpu.models.descript_discriminator import DescriptDiscriminator
    disc = DescriptDiscriminator(periods=(2, 3), fft_sizes=(512,))
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, 4096, 1))
    y = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 4096, 1))
    variables = disc.init(jax.random.PRNGKey(2), x, y)
    loss_gen, loss_dis, metrics = disc.apply(variables, x, y)
    assert np.isfinite(float(loss_gen)) and np.isfinite(float(loss_dis))
    assert "feature_matching" in metrics
    # batched disc_step path matches the split form
    lg_b, ld_b, _ = disc.apply(variables, x, y, batched=True)
    np.testing.assert_allclose(float(loss_dis), float(ld_b), rtol=1e-5)
    np.testing.assert_allclose(float(loss_gen), float(lg_b), rtol=1e-5)
