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
