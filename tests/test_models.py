"""Model-level shape/jit smoke tests plus streaming equivalence for the
denoiser KV cache."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import (AutoEncoderConfig, DenoiserConfig, ECAPAConfig,
                              Encoder1DConfig, get_config)
from after_tpu.models import (AudioCodec, Denoiser, ECAPAEncoder, Encoder1D)
from after_tpu.streaming import init_stream_state

SMALL_DN = DenoiserConfig(n_channels=8, seq_len=32, embed_dim=128,
                          cond_dim=6, tcond_dim=12, n_layers=2,
                          noise_embed_dims=32, mlp_multiplier=2)


def test_denoiser_shapes():
    dn = Denoiser(SMALL_DN)
    x = jnp.zeros((2, 32, 8))
    t = jnp.full((2,), 0.3)
    cond = jnp.zeros((2, 6))
    tcond = jnp.zeros((2, 32, 12))
    params = dn.init(jax.random.PRNGKey(0), x, t, cond, tcond)
    y = jax.jit(lambda p, *a: dn.apply(p, *a))(params, x, t, cond, tcond)
    assert y.shape == x.shape
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert n_params > 100_000


def test_denoiser_streaming_equals_offline():
    """Chunked streaming denoiser (KV cache) == offline chunk-causal forward.

    This is the central streaming-correctness property the reference never
    verifies (SURVEY §4): with window w and chunk c, the streamed outputs
    must match the offline masked forward exactly from frame 0 (our cache
    `filled` masking makes warm-up exact too).
    """
    cfg = SMALL_DN
    dn = Denoiser(cfg)
    sdn = Denoiser(cfg, streaming=True)
    B, T, C = 1, 32, cfg.n_channels
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
    t = jnp.full((B,), 0.4)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.cond_dim))
    tcond = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.tcond_dim))

    variables = dn.init(jax.random.PRNGKey(3), x, t, cond, tcond)
    y_off = dn.apply(variables, x, t, cond, tcond)

    chunk = cfg.attention_chunk_size
    cache = init_stream_state(sdn, x[:, :chunk], t, cond, tcond[:, :chunk])
    outs = []
    for i in range(0, T, chunk):
        y, aux = sdn.apply(
            {"params": variables["params"], "cache": cache},
            x[:, i:i + chunk], t, cond, tcond[:, i:i + chunk],
            cache_index=0, mutable=["cache"])
        cache = aux["cache"]
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=2e-4)


def test_denoiser_per_step_caches_are_independent():
    """Writes at cache_index i must not disturb cache_index j."""
    cfg = SMALL_DN
    sdn = Denoiser(cfg, streaming=True)
    B, C = 1, cfg.n_channels
    chunk = cfg.attention_chunk_size
    x = jax.random.normal(jax.random.PRNGKey(0), (B, chunk, C))
    t = jnp.full((B,), 0.5)
    cond = jnp.zeros((B, cfg.cond_dim))
    tcond = jnp.zeros((B, chunk, cfg.tcond_dim))
    variables = sdn.init(jax.random.PRNGKey(1), x, t, cond, tcond)
    cache0 = init_stream_state(sdn, x, t, cond, tcond)

    y0, aux = sdn.apply({"params": variables["params"], "cache": cache0},
                        x, t, cond, tcond, cache_index=0, mutable=["cache"])
    cache1 = aux["cache"]
    # step-1 slot untouched
    k0 = cache0["block_0"]["attn"]["k"]
    k1 = cache1["block_0"]["attn"]["k"]
    assert not np.allclose(np.asarray(k0[:, 0]), np.asarray(k1[:, 0]))
    np.testing.assert_array_equal(np.asarray(k0[:, 1]), np.asarray(k1[:, 1]))


def test_encoder1d_shapes_and_reg():
    cfg = Encoder1DConfig(in_size=8, channels=(16, 16, 12), ratios=(1, 1))
    enc = Encoder1D(cfg)
    x = jnp.zeros((2, 32, 8))
    variables = enc.init(jax.random.PRNGKey(0), x)
    (z, mean, kl), _ = enc.apply(variables, x, mutable=["batch_stats"])
    assert z.shape == (2, 32, 12)
    assert kl.shape == ()


def test_encoder1d_classifier_averages():
    cfg = Encoder1DConfig(in_size=12, channels=(16, 16, 16, 16, 6),
                          ratios=(1, 2, 2, 2, 1), average_out=True,
                          ac_regularisation=False)
    enc = Encoder1D(cfg)
    x = jnp.zeros((2, 32, 12))
    variables = enc.init(jax.random.PRNGKey(0), x)
    (z, _, _), _ = enc.apply(variables, x, mutable=["batch_stats"])
    assert z.shape == (2, 6)


def test_ecapa_shapes():
    cfg = ECAPAConfig(in_size=8, out_dim=6, channels=(32, 32, 32, 64))
    enc = ECAPAEncoder(cfg)
    x = jnp.zeros((2, 64, 8))
    variables = enc.init(jax.random.PRNGKey(0), x)
    (z, mean, kl), _ = enc.apply(variables, x, mutable=["batch_stats"])
    assert z.shape == (2, 6)


@pytest.mark.slow
def test_codec_roundtrip_shapes():
    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1)
    codec = AudioCodec(cfg)
    T = 4 * 4 * 64  # bands * factors * frames
    x = jnp.zeros((1, T, 1))
    variables = codec.init(jax.random.PRNGKey(0), x)
    y, yb, z, reg, xb = codec.apply(variables, x)
    assert z.shape == (1, T // cfg.ratio, 8)
    assert y.shape[2] == 1
    assert abs(y.shape[1] - T) < cfg.ratio  # PQMF trims a constant offset
    ze = codec.apply(variables, x, method=AudioCodec.encode)
    assert ze.shape == z.shape
    yd = codec.apply(variables, z, method=AudioCodec.decode)
    assert yd.shape == y.shape


def test_denoiser_v1_variants():
    from after_tpu.models import DenoiserV1, DenoiserV1Config
    base = dataclasses.replace(SMALL_DN)
    for mode, tnoise in [("cross_attention", False), ("adaln", False),
                         ("cross_attention", True)]:
        cfg = DenoiserV1Config(base=base, tcond_mode=mode,
                               temporal_noise=tnoise)
        dn = DenoiserV1(cfg)
        x = jnp.zeros((2, 32, 8))
        t = jnp.full((2,), 0.3)
        cond = jnp.zeros((2, 6))
        tcond = jnp.zeros((2, 32, 12))
        params = dn.init(jax.random.PRNGKey(0), x, t, cond, tcond)
        y = dn.apply(params, x, t, cond, tcond)
        assert y.shape == x.shape


@pytest.mark.slow
def test_unet1d():
    from after_tpu.models import UNet1D, UNet1DConfig
    cfg = UNet1DConfig(in_size=8, channels=(16, 16), ratios=(2, 2),
                       time_cond_in_channels=12, cond_channels=6)
    net = UNet1D(cfg)
    x = jnp.zeros((2, 32, 8))
    t = jnp.full((2,), 0.3)
    cond = jnp.zeros((2, 6))
    tcond = jnp.zeros((2, 32, 12))
    params = net.init(jax.random.PRNGKey(0), x, t, cond, tcond)
    y = net.apply(params, x, t, cond, tcond)
    assert y.shape == x.shape


def test_fsq():
    from after_tpu.ops.fsq import FSQ
    fsq = FSQ(levels=(8, 5, 5, 5))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4)) * 2
    q = fsq.quantize(z)
    assert q.shape == z.shape
    assert np.abs(np.asarray(q)).max() <= 1.0
    idx = fsq.codes_to_indices(q)
    assert idx.shape == (2, 16)
    assert int(idx.max()) < fsq.codebook_size
    rec = fsq.indices_to_codes(idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(q), atol=1e-5)
    # straight-through gradient flows
    g = jax.grad(lambda z_: jnp.sum(fsq.quantize(z_)))(z)
    assert float(jnp.abs(g).sum()) > 0


def test_linear_encoder():
    from after_tpu.models import LinearEncoder
    for reg in ("none", "ac", "vae"):
        enc = LinearEncoder(in_size=16, channels=(32, 32, 8),
                            regularisation=reg)
        x = jnp.zeros((2, 16))
        rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
        v = enc.init(rngs, x)
        z, mean, kl = enc.apply(v, x, rngs={"sample": jax.random.PRNGKey(2)})
        assert z.shape == (2, 8)
        assert np.isfinite(float(kl))


@pytest.mark.slow
def test_denoiser_v1_stream_equals_offline_prefix():
    """Streaming DenoiserV1 (self-attn + cross-attn KV caches) reproduces the
    offline output on each prefix while the cache window covers the sequence
    (reference CrossAttention cache, transformer.py:233-260).  Requires
    cross_attn_causal=True — the reference's non-causal offline cross-attn
    lets earlier frames attend future structure codes, which no streaming
    scheme can reproduce (its own streaming silently mismatches).
    pos_embed_ca is zeroed: the reference restarts it every chunk."""
    from after_tpu.models import DenoiserV1, DenoiserV1Config
    from after_tpu.streaming import init_stream_state, zero_cache

    base = dataclasses.replace(
        SMALL_DN, embed_dim=64, noise_embed_dims=16, causal=True,
        dropout=0.0, attention_chunk_size=4, local_attention_size=16,
        max_diffusion_steps=2, pos_emb_type="rotary")
    for tnoise in (False, True):
        cfg = DenoiserV1Config(base=base, tcond_mode="cross_attention",
                               temporal_noise=tnoise,
                               cross_attn_causal=True)
        dn = DenoiserV1(cfg)
        dn_s = DenoiserV1(cfg, streaming=True)

        T, chunk = 16, 4
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, T, 8).astype(np.float32))
        tcond = jnp.asarray(rng.randn(1, T, 12).astype(np.float32))
        cond = jnp.asarray(rng.randn(1, 6).astype(np.float32))
        t = jnp.full((1,), 0.3)

        variables = dn.init(jax.random.PRNGKey(0), x, t, cond, tcond)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        params["pos_embed_ca"] = np.zeros_like(params["pos_embed_ca"])
        cache = init_stream_state(dn_s, x[:, :chunk], t, cond,
                                  tcond[:, :chunk])

        for i in range(T // chunk):
            sl = slice(i * chunk, (i + 1) * chunk)
            y_s, aux = dn_s.apply(
                {"params": params, "cache": cache}, x[:, sl], t, cond,
                tcond[:, sl], cache_index=0, mutable=["cache"])
            cache = aux["cache"]
            y_off = dn.apply({"params": params}, x[:, :(i + 1) * chunk], t,
                             cond, tcond[:, :(i + 1) * chunk])[:, -chunk:]
            np.testing.assert_allclose(
                np.asarray(y_s), np.asarray(y_off), atol=2e-5,
                err_msg=f"tnoise={tnoise} chunk {i}")


def test_denoiser_v1_streaming_noncausal_cross_runs():
    """Reference-style streaming (non-causal cross-attn trained offline):
    runs, deterministic, and matches offline on the first chunk (where no
    future exists yet)."""
    from after_tpu.models import DenoiserV1, DenoiserV1Config
    from after_tpu.streaming import init_stream_state

    base = dataclasses.replace(
        SMALL_DN, embed_dim=64, noise_embed_dims=16, causal=True,
        dropout=0.0, attention_chunk_size=4, local_attention_size=16,
        max_diffusion_steps=2, pos_emb_type="rotary")
    cfg = DenoiserV1Config(base=base, tcond_mode="cross_attention")
    dn = DenoiserV1(cfg)
    dn_s = DenoiserV1(cfg, streaming=True)
    chunk = 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, chunk, 8).astype(np.float32))
    tcond = jnp.asarray(rng.randn(1, chunk, 12).astype(np.float32))
    cond = jnp.asarray(rng.randn(1, 6).astype(np.float32))
    t = jnp.full((1,), 0.3)
    variables = dn.init(jax.random.PRNGKey(0), x, t, cond, tcond)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["pos_embed_ca"] = np.zeros_like(params["pos_embed_ca"])
    cache = init_stream_state(dn_s, x, t, cond, tcond)
    y_s, _ = dn_s.apply({"params": params, "cache": cache}, x, t, cond,
                        tcond, cache_index=0, mutable=["cache"])
    y_off = dn.apply({"params": params}, x, t, cond, tcond)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_off), atol=2e-5)


@pytest.mark.slow
def test_denoiser_scan_layers_equals_loop():
    """scan_layers=True (one lax.scan over stacked block params) must be
    numerically identical to the unrolled loop, offline and streaming."""
    from after_tpu.models.denoiser import stack_block_params

    cfg = SMALL_DN
    cfg_s = dataclasses.replace(cfg, scan_layers=True)
    B, T, C = 1, 32, cfg.n_channels
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
    t = jnp.full((B,), 0.4)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.cond_dim))
    tcond = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.tcond_dim))

    loop = Denoiser(cfg)
    scan = Denoiser(cfg_s)
    variables = loop.init(jax.random.PRNGKey(3), x, t, cond, tcond)
    stacked = stack_block_params(variables["params"], cfg.n_layers)

    y_loop = loop.apply(variables, x, t, cond, tcond)
    y_scan = scan.apply({"params": stacked}, x, t, cond, tcond)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop),
                               atol=1e-5)

    # streaming: scanned per-layer caches thread identically
    sdn = Denoiser(cfg_s, streaming=True)
    chunk = cfg.attention_chunk_size
    cache = init_stream_state(sdn, x[:, :chunk], t, cond, tcond[:, :chunk])
    outs = []
    for i in range(0, T, chunk):
        y, aux = sdn.apply({"params": stacked, "cache": cache},
                           x[:, i:i + chunk], t, cond, tcond[:, i:i + chunk],
                           cache_index=0, mutable=["cache"])
        cache = aux["cache"]
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_loop),
                               atol=2e-4)


@pytest.mark.slow
def test_encoder1d_fsq_bottleneck():
    """FSQ as Encoder1D vector_quantizer (reference encoder.py:129,289-290):
    codes land on the quantization grid, gradients flow straight-through,
    and the config knob round-trips through JSON."""
    import json

    from after_tpu.config import Encoder1DConfig, from_json, to_json, get_config, with_overrides

    levels = (8, 5, 5, 5)
    cfg = Encoder1DConfig(in_size=8, channels=(16, 16, 4), ratios=(1, 1),
                          kernel_size=3, causal=True,
                          quantizer_levels=levels,
                          quantizer_noise_dropout=0.2)
    from after_tpu.models import Encoder1D
    enc = Encoder1D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 8))
    variables = enc.init(jax.random.PRNGKey(1), x)
    z, _, _ = enc.apply(variables, x)
    z = np.asarray(z)

    # every value sits on the normalised FSQ grid: z * (levels//2) is integer
    half = np.asarray(levels) // 2
    scaled = z * half
    np.testing.assert_allclose(scaled, np.round(scaled), atol=1e-5)
    for c, lv in enumerate(levels):
        assert len(np.unique(z[..., c])) <= lv

    # straight-through gradients reach the conv params
    def loss(params):
        zq, _, _ = enc.apply({**variables, "params": params}, x)
        return jnp.sum(jnp.square(zq))

    g = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert gnorm > 0

    # training path with noise dropout draws an rng without error
    (z2, _, _), _ = enc.apply(variables, x, training=True,
                              rng=jax.random.PRNGKey(2),
                              rngs={"dropout": jax.random.PRNGKey(3)},
                              mutable=["batch_stats"])
    assert np.isfinite(np.asarray(z2)).all()

    # config JSON round trip keeps the tuple knob
    full = with_overrides(get_config("tiny"), {
        "encoder_time.quantizer_levels": levels})
    rt = from_json(to_json(full))
    assert rt.encoder_time.quantizer_levels == levels
