"""Streaming runtime tests: causal codec stream==offline, Streamer smoke run.

The stream==offline property is the deepest correctness requirement of the
framework (SURVEY §7.3 #1) and is never verified programmatically by the
reference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import AutoEncoderConfig, with_overrides
from after_tpu.models import AudioCodec
from after_tpu.streaming import init_stream_state
from after_tpu.streaming.streamer import Streamer
from tests.test_diffusion import micro_config


def causal_micro_ae():
    return AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                             multipliers=(1, 2, 2), factors=(2, 2),
                             dilations=(1, 3), num_blocks_per_stage=1,
                             causal=True, use_norm=False)


def test_causal_codec_encode_stream_equals_offline():
    cfg = causal_micro_ae()
    codec = AudioCodec(cfg)
    scodec = AudioCodec(cfg, streaming=True)
    T = cfg.ratio * 32
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, T, 1))
    variables = codec.init(jax.random.PRNGKey(1), x)
    z_off = codec.apply(variables, x, method=AudioCodec.encode)

    chunk = cfg.ratio * 4
    cache = init_stream_state(scodec, x[:, :chunk], method=AudioCodec.encode)
    outs = []
    for i in range(0, T, chunk):
        z, aux = scodec.apply({"params": variables["params"], "cache": cache},
                              x[:, i:i + chunk], method=AudioCodec.encode,
                              mutable=["cache"])
        cache = aux["cache"]
        outs.append(z)
    z_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(z_stream), np.asarray(z_off),
                               atol=1e-4)


def test_causal_codec_decode_stream_equals_offline():
    cfg = causal_micro_ae()
    codec = AudioCodec(cfg)
    scodec = AudioCodec(cfg, streaming=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32, cfg.z_channels))
    variables = codec.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, cfg.ratio * 32, 1)))
    y_off = codec.apply(variables, z, method=AudioCodec.decode)

    cache = init_stream_state(scodec, z[:, :4], method=AudioCodec.decode)
    outs = []
    for i in range(0, 32, 4):
        y, aux = scodec.apply({"params": variables["params"], "cache": cache},
                              z[:, i:i + 4], method=AudioCodec.decode,
                              mutable=["cache"])
        cache = aux["cache"]
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    # streaming decoder output is delayed by the (static) transpose-conv
    # delay metadata; equality holds exactly after the warm-up transient
    from after_tpu.models.autoencoder import decoder_band_delay
    lag = decoder_band_delay(cfg) * cfg.pqmf_bands
    off = np.asarray(y_off)[0, :, 0]
    stream = np.asarray(y_stream)[0, :, 0]
    skip = 8 * cfg.ratio  # warm-up transient (receptive field)
    a = off[skip:len(stream) - lag]
    b = stream[skip + lag:]
    err = np.abs(a - b).max()
    assert err < 1e-4, f"stream/offline mismatch {err} (lag {lag})"


def test_streamer_full_graph():
    cfg = micro_config()
    cfg = with_overrides(cfg, {
        "autoencoder.causal": True,
        "autoencoder.use_norm": False,
        "train.n_signal": 32,
    })
    streamer = Streamer(cfg, chunk_size=4)
    from after_tpu.diffusion import TransferPipeline
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    state = streamer.init_state(variables, batch_size=1)

    audio = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                    (1, streamer.audio_chunk, 1))
    out, state = streamer.forward(variables, state, audio, audio,
                                  nb_steps=2)
    assert out.shape == (1, streamer.audio_chunk, 1)
    assert np.isfinite(np.asarray(out)).all()
    # run a few more chunks; state threads through
    for _ in range(3):
        out, state = streamer.forward(variables, state, audio, audio,
                                      nb_steps=2)
    assert np.isfinite(np.asarray(out)).all()


def _causal_micro_cfg():
    cfg = micro_config()
    return with_overrides(cfg, {"autoencoder.causal": True,
                                "autoencoder.use_norm": False})


@pytest.mark.slow
def test_timbre_ring_matches_offline_window():
    """The streamed timbre branch == offline: after c buffers the ring holds
    the last n_signal latents of the timbre stream, so the streamed zt must
    equal the ECAPA encoder applied to the offline codec latents of that
    window (export.py:419-430 previous_timbre semantics)."""
    from after_tpu.diffusion import TransferPipeline

    cfg = _causal_micro_cfg()
    streamer = Streamer(cfg, chunk_size=4)
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    A, T = streamer.audio_chunk, streamer.chunk_size
    n_sig = cfg.train.n_signal
    K = n_sig // T + 3  # ring fills after n_signal/chunk buffers

    audio = 0.1 * np.random.RandomState(7).randn(1, K * A, 1).astype(
        np.float32)
    z_off = np.asarray(pipe.encode(variables, jnp.asarray(audio)))

    state = streamer.init_state(variables, 1)
    for c in range(K):
        zt, state = streamer.timbre(variables, state,
                                    jnp.asarray(audio[:, c * A:(c + 1) * A]))
        end = (c + 1) * T
        if end >= n_sig:
            window = jnp.asarray(z_off[:, end - n_sig:end])
            zt_off = pipe.timbre(variables, window)
            np.testing.assert_allclose(np.asarray(zt), np.asarray(zt_off),
                                       atol=1e-4)


@pytest.mark.slow
def test_full_graph_stream_matches_offline():
    """The COMPOSED per-buffer a2a graph (Streamer.forward: timbre ring +
    structure encoder + KV-cached sampler + streaming decode) equals the
    offline TransferPipeline on the same audio after the warm-up transient
    — the repo's #1 correctness bar (SURVEY §7.3), previously only checked
    per component.

    Construction for exact correspondence: the timbre stream is one buffer
    repeated, so its latents are exactly periodic once the codec's FIR
    receptive field passes and the streamed zt is constant after the ring
    fills; the offline sampler gets the concatenated per-buffer noises and
    that steady zt.  Buffers past (ring fill + local attention window +
    decoder receptive field) must then match to float accumulation error."""
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.models.autoencoder import decoder_band_delay

    cfg = _causal_micro_cfg()
    streamer = Streamer(cfg, chunk_size=4)
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    A, T = streamer.audio_chunk, streamer.chunk_size
    n_sig = cfg.train.n_signal
    K = 16
    nb_steps = 2
    rs = np.random.RandomState(11)
    a_struct = 0.1 * rs.randn(1, K * A, 1).astype(np.float32)
    tim_buf = 0.1 * rs.randn(1, A, 1).astype(np.float32)

    # -- streamed --------------------------------------------------------
    state = streamer.init_state(variables, 1)
    ys = []
    for c in range(K):
        y, state = streamer.forward(
            variables, state, jnp.asarray(a_struct[:, c * A:(c + 1) * A]),
            jnp.asarray(tim_buf), nb_steps,
            rng=jax.random.PRNGKey(1000 + c))
        ys.append(np.asarray(y))
    y_stream = np.concatenate(ys, axis=1)[0, :, 0]

    # -- offline ---------------------------------------------------------
    z_struct = pipe.encode(variables, jnp.asarray(a_struct))
    tcond = pipe.structure(variables, z_struct)
    z_tim = np.asarray(pipe.encode(
        variables, jnp.asarray(np.tile(tim_buf, (1, K, 1)))))
    # guard: the repeated-buffer latents really are periodic over the
    # compared windows (FIR codec; fails loudly if a recurrent path
    # appears), so the streamed zt is constant there
    last = z_tim[:, K * T - n_sig:]
    prev = z_tim[:, (K - 1) * T - n_sig:(K - 1) * T]
    np.testing.assert_allclose(prev, last, atol=1e-5)
    zt = pipe.timbre(variables, jnp.asarray(last))
    x0 = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1000 + c),
                           (1, T, cfg.denoiser.n_channels))
         for c in range(K)], axis=1)
    z_out = pipe.diffuse(variables, x0, zt, tcond, nb_steps)
    y_off = np.asarray(pipe.decode(variables, z_out))[0, :, 0]

    # -- compare past the transient, at the streaming decoder's lag ------
    lag = decoder_band_delay(cfg.autoencoder) * cfg.autoencoder.pqmf_bands
    warm = 13 * A  # ring fill (8) + attention window (2) + FIR margin
    a = y_off[warm:len(y_stream) - lag]
    b = y_stream[warm + lag:]
    err = np.abs(a - b).max()
    denom = np.abs(a).max()
    assert err < 1e-3 and err / denom < 0.02, (err, denom)
    cfg = micro_config()
    cfg = with_overrides(cfg, {"autoencoder.causal": True,
                               "autoencoder.use_norm": False})
    streamer = Streamer(cfg)
    specs = streamer.method_specs()
    assert specs["structure"]["out_channels"] == cfg.zs_channels
    assert specs["decode"]["in_ratio"] == cfg.autoencoder.ratio


def test_streamer_midi_diffuse():
    cfg = micro_config()
    cfg = with_overrides(cfg, {
        "autoencoder.causal": True,
        "autoencoder.use_norm": False,
        "zs_channels": 128,
        "denoiser.tcond_dim": 128,
        "structure_type": "midi",
    })
    cfg = dataclasses.replace(cfg, encoder_time=None, classifier=None)
    streamer = Streamer(cfg, chunk_size=4)
    from after_tpu.diffusion import TransferPipeline
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    state = streamer.init_state(variables, 1)
    notes = np.zeros((1, 4, 8, 2), np.float32)
    notes[0, :, 0] = [60, 100]
    notes[0, :, 1] = [64, 80]
    zt = np.zeros((1, cfg.zt_channels), np.float32)
    z, state = streamer.diffuse_midi(variables, state, jnp.asarray(notes),
                                     jnp.asarray(zt), 2)
    assert z.shape == (1, 4, cfg.denoiser.n_channels)
    assert np.isfinite(np.asarray(z)).all()


def test_crossfade_decoder_noncausal():
    """Cross-fade streaming decode of a non-causal codec approximates the
    offline decode away from chunk boundaries (reference AE_notcausal,
    export_autoencoder.py:131-153)."""
    from after_tpu.streaming.crossfade import CrossfadeDecoder
    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1,
                            causal=False, use_norm=False)
    codec = AudioCodec(cfg)
    z = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (1, 64, 8))
    # smooth the latents so neighbouring frames correlate (realistic case)
    z = (z + jnp.roll(z, 1, 1) + jnp.roll(z, 2, 1)) / 3
    variables = codec.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, cfg.ratio * 64, 1)))
    y_off = np.asarray(codec.apply(variables, z, method=AudioCodec.decode))

    dec = CrossfadeDecoder(cfg, n_fade=4)
    state = dec.init_state(variables, 1)
    outs = []
    for i in range(0, 64, 8):
        y, state = dec.decode(variables, state, z[:, i:i + 8])
        outs.append(y)
    y_stream = np.asarray(jnp.concatenate(outs, axis=1))
    # streamed output lags by n_fade latent frames; compare energies of the
    # interior region (crossfade is approximate, not sample-exact)
    lag = 4 * cfg.ratio
    n = min(y_off.shape[1] - 0, y_stream.shape[1] - lag)
    a = y_off[0, cfg.ratio * 8: n - cfg.ratio * 8, 0]
    b = y_stream[0, lag + cfg.ratio * 8: lag + len(a) + cfg.ratio * 8, 0][:len(a)]
    err = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a ** 2)) + 1e-9)
    assert err < 0.35, f"crossfade decode too far from offline: rel rmse {err}"


def test_crossfade_full_chain_noncausal():
    """Context-window encode + crossfade decode of a norm-free non-causal
    codec approximates the offline encode-decode (the tight quality bar for
    the crossfade scheme; the GN variant's bound lives in test_export)."""
    from after_tpu.streaming.crossfade import CrossfadeDecoder
    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1,
                            causal=False, use_norm=False)
    codec = AudioCodec(cfg)
    variables = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, cfg.ratio * 64, 1)))
    t = np.arange(64 * cfg.ratio) / 44100.0
    audio = (0.3 * np.sin(2 * np.pi * 330 * t)
             + 0.1 * np.sin(2 * np.pi * 110 * t)).astype(np.float32)
    audio = audio[None, :, None]
    z_off = codec.apply(variables, jnp.asarray(audio),
                        method=AudioCodec.encode)
    y_off = np.asarray(codec.apply(variables, z_off,
                                   method=AudioCodec.decode))

    dec = CrossfadeDecoder(cfg, n_fade=4, chunk_size=8)
    enc_st = dec.init_encode_state(variables, 1)
    dec_st = dec.init_state(variables, 1)
    outs = []
    A = 8 * cfg.ratio
    for i in range(0, 64 * cfg.ratio, A):
        z, enc_st = dec.encode(variables, enc_st,
                               jnp.asarray(audio[:, i:i + A]))
        y, dec_st = dec.decode(variables, dec_st, z)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=1)

    lag = 4 * cfg.ratio
    a = y_off[0, A: 48 * cfg.ratio, 0]
    b = y_stream[0, lag + A: lag + A + len(a), 0]
    err = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a ** 2)) + 1e-9)
    assert err < 0.45, f"crossfade full chain too far from offline: {err}"
