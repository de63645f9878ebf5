"""Op-level tests: conv parity vs torch, streaming==offline, PQMF round trip,
masks vs reference semantics, rotary, stft vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.ops import (PQMF, StreamConv1d, StreamConvTranspose1d,
                           chunkwise_causal_mask, get_padding, mask_bias,
                           sliding_chunkwise_mask, stft)
from after_tpu.ops.rotary import rotate_q_with_cached_k


def test_get_padding():
    assert get_padding(3, mode="causal") == (2, 0)
    assert get_padding(3, mode="centered") == (1, 1)
    assert get_padding(1, mode="causal") == (0, 0)
    # strided downsample conv (kernel 2r, stride r)
    assert get_padding(4, 2, mode="causal") == (2, 0)
    assert get_padding(3, 1, 3, mode="causal") == (6, 0)


def _torch_conv_ref(x_btc, kernel_kio, bias, stride, dilation, pad):
    import torch
    xt = torch.from_numpy(np.asarray(x_btc).transpose(0, 2, 1))  # B,C,T
    w = torch.from_numpy(np.asarray(kernel_kio).transpose(2, 1, 0))  # O,I,K
    b = torch.from_numpy(np.asarray(bias))
    xt = torch.nn.functional.pad(xt, pad)
    y = torch.nn.functional.conv1d(xt, w, b, stride=stride, dilation=dilation)
    return y.numpy().transpose(0, 2, 1)


@pytest.mark.parametrize("mode,k,s,d", [
    ("causal", 3, 1, 1), ("causal", 5, 1, 1), ("causal", 3, 1, 9),
    ("causal", 8, 4, 1), ("centered", 3, 1, 1), ("centered", 4, 2, 1),
])
def test_conv_matches_torch(mode, k, s, d):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 6))
    conv = StreamConv1d(features=5, kernel_size=k, stride=s, dilation=d,
                        mode=mode, use_weight_norm=False)
    params = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(params, x)
    pad = get_padding(k, s, d, mode)
    y_ref = _torch_conv_ref(x, params["params"]["kernel"],
                            params["params"]["bias"], s, d,
                            (pad[0], pad[1]))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)
    assert y.shape[1] == x.shape[1] // s


@pytest.mark.parametrize("k,s,d", [(3, 1, 1), (3, 1, 3), (8, 4, 1), (5, 1, 1)])
def test_streaming_conv_equals_offline(k, s, d):
    """Causal conv streamed chunk-by-chunk must bit-match the offline output."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))
    conv = StreamConv1d(features=3, kernel_size=k, stride=s, dilation=d,
                        mode="causal")
    sconv = StreamConv1d(features=3, kernel_size=k, stride=s, dilation=d,
                         mode="causal", streaming=True)
    variables = conv.init(jax.random.PRNGKey(1), x)
    y_off = conv.apply(variables, x)

    from after_tpu.streaming import init_stream_state
    cache = init_stream_state(sconv, x[:, :8])
    outs = []
    for i in range(0, 64, 8):
        y, aux = sconv.apply({"params": variables["params"], "cache": cache},
                             x[:, i:i + 8], mutable=["cache"])
        cache = aux["cache"]
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=1e-6)


def test_streaming_transpose_conv_overlap_add():
    """Streaming transpose conv == offline computed causally (same total)."""
    f = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 3))
    up = StreamConvTranspose1d(features=2, kernel_size=2 * f, stride=f)
    sup = StreamConvTranspose1d(features=2, kernel_size=2 * f, stride=f,
                                streaming=True)
    variables = up.init(jax.random.PRNGKey(1), x)
    y_off = up.apply(variables, x)
    assert y_off.shape == (1, 16 * f, 2)

    from after_tpu.streaming import init_stream_state
    cache = init_stream_state(sup, x[:, :4])
    outs = []
    for i in range(0, 16, 4):
        y, aux = sup.apply({"params": variables["params"], "cache": cache},
                           x[:, i:i + 4], mutable=["cache"])
        cache = aux["cache"]
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    # streamed output is delayed by f//2 frames vs centered offline
    delay = f // 2
    np.testing.assert_allclose(np.asarray(y_stream[:, delay:]),
                               np.asarray(y_off[:, :-delay]), atol=1e-5)


def test_weight_norm_identity_at_init():
    """With g initialised to ||v||, weight-normed conv == plain conv."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 4))
    conv = StreamConv1d(features=3, kernel_size=3, use_weight_norm=True)
    variables = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(variables, x)
    plain = StreamConv1d(features=3, kernel_size=3, use_weight_norm=False)
    pvars = {"params": {k: v for k, v in variables["params"].items() if k != "g"}}
    y2 = plain.apply(pvars, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)


def test_pqmf_roundtrip():
    pqmf = PQMF(attenuation=100, n_band=16)
    t = np.arange(2 ** 14) / 44100
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
    x = jnp.asarray(x)[None, :, None]
    bands = pqmf.forward(x)
    assert bands.shape == (1, 2 ** 14 // 16, 16)
    y = pqmf.inverse(bands)
    # align (PQMF introduces a constant delay); find best lag and check SNR
    xv = np.asarray(x)[0, :, 0]
    yv = np.asarray(y)[0, :, 0]
    n = min(len(xv), len(yv))
    corr = np.correlate(yv[:n], xv[:n], "full")
    lag = corr.argmax() - (n - 1)
    if lag >= 0:
        a, b = xv[:n - lag], yv[lag:n]
    else:
        a, b = xv[-lag:n], yv[:n + lag]
    m = min(len(a), len(b)) - 1000
    a, b = a[500:500 + m], b[500:500 + m]
    snr = 10 * np.log10(np.sum(a ** 2) / np.sum((a - b) ** 2))
    assert snr > 60, f"PQMF roundtrip SNR too low: {snr:.1f} dB (lag {lag})"


def test_masks_match_reference_semantics():
    """Vectorised masks == the reference's loop-built masks (flipped)."""
    def ref_chunk_mask(seq_len, chunk):
        mask = np.zeros((seq_len, seq_len))
        for i in range(0, seq_len, chunk):
            end = min(i + chunk, seq_len)
            mask[i:end, i:end] = 1
            mask[i:end, :i] = 1
        return 1 - mask  # 1 = masked

    def ref_sliding_mask(seq_len, chunk, window):
        mask = np.ones((seq_len, seq_len))
        for i in range(0, seq_len, chunk):
            end = min(i + chunk, seq_len)
            mask[i:end, i:end] = 0
            for j in range(i, end):
                start = max(0, j - window + 1)
                mask[j, start:i] = 0
        return mask

    m = chunkwise_causal_mask(17, 4)
    np.testing.assert_array_equal(~m, ref_chunk_mask(17, 4).astype(bool))
    m2 = sliding_chunkwise_mask(32, 4, 8)
    np.testing.assert_array_equal(~m2, ref_sliding_mask(32, 4, 8).astype(bool))
    bias = mask_bias(m2)
    assert bias.shape == (32, 32)
    assert bias[0, 0] == 0.0


def test_rotary_cached_offset_consistency():
    """Streaming rotary (cached keys) == offline rotary on the full sequence."""
    d = 64
    q_full = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 12, d))
    k_full = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 12, d))
    qr_full, kr_full = rotate_q_with_cached_k(q_full, k_full, rot_dim=32)
    # stream: last 4 queries with all 12 keys
    q_tail = q_full[:, :, 8:]
    qr_tail, kr_all = rotate_q_with_cached_k(q_tail, k_full, rot_dim=32)
    np.testing.assert_allclose(np.asarray(qr_tail),
                               np.asarray(qr_full[:, :, 8:]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr_all), np.asarray(kr_full),
                               atol=1e-5)


def test_stft_matches_torch():
    import torch
    x = np.random.RandomState(0).randn(3, 4096).astype(np.float32)
    for n_fft, hop in [(1024, 256), (256, 64), (32, 8)]:
        z = stft.stft(jnp.asarray(x), n_fft, hop)
        zt = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft,
                        torch.hann_window(n_fft), return_complex=True,
                        center=True)
        zt = zt.numpy().transpose(0, 2, 1)  # (B, frames, bins)
        np.testing.assert_allclose(np.asarray(z), zt, atol=2e-3)


def test_matmul_dft_matches_fft():
    """The MXU windowed-DFT matmul path == jnp.fft.rfft, values and grads.

    The matmul rewrite (stft._MATMUL_DFT_ENABLED) is the default for
    n_fft <= 4096 because TPU FFTs run ~1 TFLOP/s; it must stay bit-close to
    the FFT it replaces (torch.stft conventions, reference core.py:508-813).
    """
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4096).astype(np.float32))

    def loss(x, n_fft, hop):
        return jnp.sum(jnp.abs(stft.stft(x, n_fft, hop)))

    for n_fft, hop in [(32, 8), (256, 64), (2048, 512)]:
        try:
            stft.use_matmul_dft(True)
            za = stft.stft(x, n_fft, hop)
            ga = jax.grad(loss)(x, n_fft, hop)
            stft.use_matmul_dft(False)
            zb = stft.stft(x, n_fft, hop)
            gb = jax.grad(loss)(x, n_fft, hop)
        finally:
            stft.use_matmul_dft(True)
        scale = float(jnp.max(jnp.abs(zb)))
        np.testing.assert_allclose(np.asarray(za), np.asarray(zb),
                                   atol=1e-4 * scale)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-4 * float(jnp.max(jnp.abs(gb))))


def test_mel_matches_torchaudio_fb():
    torchaudio = pytest.importorskip("torchaudio")
    import torch
    fb_ref = torchaudio.functional.melscale_fbanks(
        513, 0.0, 22050.0, 80, 44100).numpy().T  # (n_mels, bins)
    from after_tpu.ops.stft import mel_filterbank
    fb = mel_filterbank(44100, 1024, 80, htk=True)
    np.testing.assert_allclose(fb, fb_ref, atol=1e-4)


def test_bf16_dft_close_to_f32():
    """stft(dft_dtype=bf16): bf16 operands with f32 accumulation must stay
    within bf16 input-quantization error of the f32 DFT (opt-in MR-STFT
    speed lever, AETrainConfig.stft_bf16_dft)."""
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8192).astype(np.float32))
    za = stft.stft(x, 512, 128)
    zb = stft.stft(x, 512, 128, dft_dtype=jnp.bfloat16)
    assert zb.dtype == za.dtype
    scale = float(jnp.max(jnp.abs(za)))
    err = float(jnp.max(jnp.abs(za - zb))) / scale
    assert err < 2e-2, err

    import dataclasses

    from after_tpu.autoencoder.losses import multi_resolution_stft_loss
    from after_tpu.config import AETrainConfig
    tc32 = AETrainConfig(num_signal=8192, stft_fft_sizes=(512, 128),
                         stft_hop_sizes=(128, 32), stft_win_lengths=(512, 128))
    tc16 = dataclasses.replace(tc32, stft_bf16_dft=True)
    a = jnp.asarray(0.1 * np.random.RandomState(4).randn(2, 8192, 1)
                    .astype(np.float32))
    b = jnp.asarray(0.1 * np.random.RandomState(5).randn(2, 8192, 1)
                    .astype(np.float32))
    # dissimilar signals: the true loss dominates the quantization noise
    l32 = float(multi_resolution_stft_loss(a, b, tc32))
    l16 = float(multi_resolution_stft_loss(a, b, tc16))
    assert abs(l32 - l16) / abs(l32) < 0.02, (l32, l16)
    # near-identical signals: bf16 input quantization becomes a visible
    # noise FLOOR (measured ~0.036 absolute here — 3x the true loss at
    # delta=1e-2) — this is why stft_bf16_dft is opt-in and documented as
    # a late-training fidelity ceiling, not a free speedup
    c = a + 0.01 * b
    f32 = float(multi_resolution_stft_loss(a, c, tc32))
    f16 = float(multi_resolution_stft_loss(a, c, tc16))
    assert f16 >= f32 * 0.98, (f32, f16)          # it is a floor, not noise
    assert f16 - f32 < 0.1, (f32, f16)            # and a bounded one


def test_subpixel_transpose_conv_matches_lax():
    """The subpixel-matmul upsampler equals lax.conv_transpose (values +
    grads) for the codec's kernel=2f stride=f geometry, offline and
    streaming."""
    import numpy as np

    from after_tpu.ops.conv import use_matmul_upsample

    rng = np.random.RandomState(0)
    for f, Cin, Cout, T in ((2, 3, 5, 12), (4, 8, 6, 16), (4, 1, 1, 8)):
        x = jnp.asarray(rng.randn(2, T, Cin).astype(np.float32))
        up = StreamConvTranspose1d(features=Cout, kernel_size=2 * f,
                                   stride=f)
        variables = up.init(jax.random.PRNGKey(1), x)

        def loss(v, use):
            use_matmul_upsample(use)
            try:
                return jnp.sum(jnp.sin(up.apply(v, x)))
            finally:
                use_matmul_upsample(True)

        try:
            use_matmul_upsample(True)
            y_sub = up.apply(variables, x)
            use_matmul_upsample(False)
            y_lax = up.apply(variables, x)
        finally:
            use_matmul_upsample(True)
        np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_lax),
                                   atol=2e-5)
        g_sub = jax.grad(loss)(variables, True)
        g_lax = jax.grad(loss)(variables, False)
        for a, b in zip(jax.tree_util.tree_leaves(g_sub),
                        jax.tree_util.tree_leaves(g_lax)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
