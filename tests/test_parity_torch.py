"""Numeric parity vs the PyTorch reference (BASELINE.md: outputs < 1e-3 MSE).

Imports the reference modules from /root/reference at test time (read-only,
with stubs for their unavailable deps), ports their randomly-initialised
weights through after_tpu.utils.port_torch, and compares forward outputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_stubs():
    """Stub gin/torchaudio/cached_conv so reference modules import."""
    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")

        def configurable(fn=None, **kw):
            if fn is None:
                return lambda f: f
            return fn

        gin.configurable = configurable
        gin.register = configurable
        sys.modules["gin"] = gin
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")

        class _Mel:  # never constructed in these tests
            def __init__(self, *a, **k):
                pass

        tr.MelSpectrogram = _Mel
        tr.Spectrogram = _Mel
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr


def _load_reference_module(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_transformerv2():
    _install_stubs()
    _load_reference_module(
        "ref_rotary",
        "/root/reference/after/diffusion/networks/rotary_embedding.py")
    # transformerv2 does a relative import of rotary_embedding; load it as a
    # package-style module
    import importlib.util
    path = "/root/reference/after/diffusion/networks/transformerv2.py"
    src = open(path).read().replace(
        "from .rotary_embedding import RotaryEmbedding",
        "from ref_rotary import RotaryEmbedding")
    mod = types.ModuleType("ref_transformerv2")
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def test_denoiser_v2_parity(ref_transformerv2):
    """Reference DenoiserV2 forward == ported after_tpu Denoiser forward."""
    import jax
    import jax.numpy as jnp

    from after_tpu.config import DenoiserConfig
    from after_tpu.models import Denoiser
    from after_tpu.utils.port_torch import map_denoiser_v2

    torch.manual_seed(0)
    n_layers, n_ch, T, E = 2, 8, 32, 128
    ref = ref_transformerv2.DenoiserV2(
        n_channels=n_ch, seq_len=T, embed_dim=E, cond_dim=6, tcond_dim=12,
        noise_embed_dims=32, n_layers=n_layers, mlp_multiplier=2,
        dropout=0.0, causal=True, pos_emb_type="rotary",
        local_attention_size=8, attention_chunk_size=4).eval()

    sd = {("net." + k): v for k, v in ref.state_dict().items()}
    params = map_denoiser_v2(sd, n_layers)

    cfg = DenoiserConfig(n_channels=n_ch, seq_len=T, embed_dim=E, cond_dim=6,
                         tcond_dim=12, noise_embed_dims=32, n_layers=n_layers,
                         mlp_multiplier=2, dropout=0.0, causal=True,
                         pos_emb_type="rotary", local_attention_size=8,
                         attention_chunk_size=4)
    mine = Denoiser(cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, T, n_ch).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    cond = rng.randn(2, 6).astype(np.float32)
    tcond = rng.randn(2, T, 12).astype(np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                    torch.from_numpy(t),
                    torch.from_numpy(cond),
                    torch.from_numpy(tcond.transpose(0, 2, 1)))
    y_ref = y_ref.numpy().transpose(0, 2, 1)

    y = mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                   jnp.asarray(cond), jnp.asarray(tcond))
    y = np.asarray(y)
    mse = float(np.mean((y - y_ref) ** 2))
    assert mse < 1e-6, f"denoiser parity MSE {mse}"


def test_ecapa_parity():
    """Reference ECAPATDNN forward == ported after_tpu ECAPAEncoder."""
    _install_stubs()
    mod = _load_reference_module(
        "ref_ecapa",
        "/root/reference/after/diffusion/networks/ecapa_encoder.py")
    import jax.numpy as jnp

    from after_tpu.config import ECAPAConfig
    from after_tpu.models import ECAPAEncoder
    from after_tpu.utils.port_torch import map_ecapa

    torch.manual_seed(0)
    channels = [32, 32, 32, 64]
    ref = mod.ECAPATDNN(in_size=8, out_dim=6, channels=channels,
                        kernel_sizes=[3, 3, 3, 3], dilations=[1, 1, 1, 1],
                        groups=[1, 1, 1, 1], res2net_scale=8, se_channels=16,
                        attention_channels=16, global_context=True,
                        pooling=True, use_tanh=False,
                        spherical_normalisation=False,
                        regularisation="ac").eval()
    sd = {("encoder." + k): v for k, v in ref.state_dict().items()}
    variables = map_ecapa(sd, n_blocks=len(channels), res2net_scale=8)

    cfg = ECAPAConfig(in_size=8, out_dim=6, channels=tuple(channels),
                      se_channels=16, attention_channels=16)
    mine = ECAPAEncoder(cfg)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 8).astype(np.float32)
    with torch.no_grad():
        z_ref = ref(torch.from_numpy(x.transpose(0, 2, 1)))
    z_ref = z_ref.numpy()

    z, _, _ = mine.apply(variables, jnp.asarray(x))
    mse = float(np.mean((np.asarray(z) - z_ref) ** 2))
    assert mse < 1e-6, f"ecapa parity MSE {mse}"


def test_codec_parity():
    """Reference AutoEncoder encode/decode == ported after_tpu AudioCodec."""
    sys.path.insert(0, "tests")
    from ref_loader import load_reference_codec_module
    import jax.numpy as jnp

    from after_tpu.config import AutoEncoderConfig
    from after_tpu.models import AudioCodec
    from after_tpu.utils.port_torch import map_codec

    sns = load_reference_codec_module()
    torch.manual_seed(0)
    ref = sns.AutoEncoder(
        in_channels=4, channels=8, z_channels=8, multipliers=[1, 2, 2],
        factors=[2, 2], dilations=[1, 3, 9], kernel_size=3,
        bottleneck=sns.ReluBottleneck(sigma=0.0, scale=3),
        use_norm=False, decoder_ratio=1.5, pqmf_bands=4,
        use_loudness=True, use_noise=False).eval()
    sd = ref.state_dict()
    params = map_codec(sd, n_stages=2, num_blocks=3, use_norm=False)

    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3, 9), num_blocks_per_stage=3,
                            use_norm=False, decoder_ratio=1.5,
                            bottleneck="relu", bottleneck_sigma=0.0)
    mine = AudioCodec(cfg)

    rng = np.random.RandomState(0)
    T = cfg.ratio * 16
    x = (0.3 * rng.randn(1, T)).astype(np.float32)
    with torch.no_grad():
        z_ref, _ = ref.encode(torch.from_numpy(x[None]))
        y_ref = ref.decode(z_ref)
    z_ref_np = z_ref.numpy().transpose(0, 2, 1)

    z = mine.apply({"params": params}, jnp.asarray(x[..., None]),
                   method=AudioCodec.encode)
    mse_z = float(np.mean((np.asarray(z) - z_ref_np) ** 2))
    assert mse_z < 1e-6, f"codec encode parity MSE {mse_z}"

    y = mine.apply({"params": params}, jnp.asarray(z_ref_np),
                   method=AudioCodec.decode)
    y_ref_np = y_ref.numpy().transpose(0, 2, 1)
    n = min(y.shape[1], y_ref_np.shape[1])
    mse_y = float(np.mean((np.asarray(y)[:, :n] - y_ref_np[:, :n]) ** 2))
    assert mse_y < 1e-6, f"codec decode parity MSE {mse_y}"


def test_encoder1d_parity():
    """Reference Encoder1D (structure encoder) == ported after_tpu Encoder1D."""
    sys.path.insert(0, "tests")
    from ref_loader import load_reference_encoder1d
    import jax.numpy as jnp

    from after_tpu.config import Encoder1DConfig
    from after_tpu.models import Encoder1D
    from after_tpu.utils.port_torch import map_encoder1d

    mod = load_reference_encoder1d()
    torch.manual_seed(0)
    ref = mod.Encoder1D(in_size=8, channels=[16, 16, 12], ratios=[1, 2],
                        kernel_size=5, use_tanh=False, average_out=False,
                        upscale_out=False, ac_regularisation=True).eval()
    variables = map_encoder1d(ref.state_dict(), n_channels=3)

    cfg = Encoder1DConfig(in_size=8, channels=(16, 16, 12), ratios=(1, 2),
                          kernel_size=5, causal=False)
    mine = Encoder1D(cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 8).astype(np.float32)
    with torch.no_grad():
        z_ref = ref(torch.from_numpy(x.transpose(0, 2, 1)))
    z_ref = z_ref.numpy().transpose(0, 2, 1)
    z, _, _ = mine.apply(variables, jnp.asarray(x))
    mse = float(np.mean((np.asarray(z) - z_ref) ** 2))
    assert mse < 1e-6, f"encoder1d parity MSE {mse}"


def test_full_sampler_trajectory_parity(ref_transformerv2):
    """The scan-fused Euler sampler with 3-way CFG reproduces a torch-side
    Euler loop over the reference DenoiserV2 (final latents < 1e-3 MSE —
    the BASELINE.md bar — over 8 steps with guidance)."""
    import jax
    import jax.numpy as jnp

    from after_tpu.config import AfterConfig, DenoiserConfig, with_overrides
    from after_tpu.diffusion import RectifiedFlow
    from after_tpu.utils.port_torch import map_denoiser_v2

    torch.manual_seed(1)
    n_layers, n_ch, T, E = 2, 8, 32, 128
    ref = ref_transformerv2.DenoiserV2(
        n_channels=n_ch, seq_len=T, embed_dim=E, cond_dim=6, tcond_dim=12,
        noise_embed_dims=32, n_layers=n_layers, mlp_multiplier=2,
        dropout=0.0, causal=True, pos_emb_type="rotary",
        local_attention_size=8, attention_chunk_size=4).eval()
    params = map_denoiser_v2(
        {("net." + k): v for k, v in ref.state_dict().items()}, n_layers)

    cfg = with_overrides(AfterConfig(), {
        "denoiser.n_channels": n_ch, "denoiser.seq_len": T,
        "denoiser.embed_dim": E, "denoiser.noise_embed_dims": 32,
        "denoiser.n_layers": n_layers, "denoiser.mlp_multiplier": 2,
        "denoiser.dropout": 0.0,
        "encoder.in_size": n_ch, "encoder_time.in_size": n_ch,
    })
    rf = RectifiedFlow(cfg)

    rng = np.random.RandomState(3)
    x0 = rng.randn(1, T, n_ch).astype(np.float32)
    cond = rng.randn(1, 6).astype(np.float32)
    tcond = rng.randn(1, T, 12).astype(np.float32)
    nb_steps, gt, gs = 8, 2.0, 1.5

    # torch-side Euler with the reference 3-way CFG (model.py:721-785)
    drop = -4.0
    xt = torch.from_numpy(x0.transpose(0, 2, 1))
    ct = torch.from_numpy(cond)
    tt = torch.from_numpy(tcond.transpose(0, 2, 1))
    dt = 1.0 / nb_steps
    with torch.no_grad():
        for t in np.linspace(0, 1, nb_steps + 1)[:-1]:
            full_x = xt.repeat(3, 1, 1)
            full_t = torch.full((3,), float(t))
            full_c = torch.cat([ct, drop * torch.ones_like(ct),
                                drop * torch.ones_like(ct)])
            full_tc = torch.cat([tt, tt, drop * torch.ones_like(tt)])
            dx = ref(full_x, full_t, full_c, full_tc)
            dx_full, dx_tc, dx_none = torch.chunk(dx, 3, 0)
            total = 0.5 * (gs + gt)
            factor = gt / max(gs, 0.01)
            dx = dx_none + total * (dx_tc + factor * (dx_full - dx_tc)
                                    - dx_none)
            xt = xt + dx * dt
    x_ref = xt.numpy().transpose(0, 2, 1)

    x = rf.sample({"params": params}, jnp.asarray(x0), jnp.asarray(cond),
                  jnp.asarray(tcond), nb_steps, gt, gs)
    mse = float(np.mean((np.asarray(x) - x_ref) ** 2))
    assert mse < 1e-3, f"sampler trajectory parity MSE {mse}"


def test_cached_group_norm_streaming_parity():
    """StreamGroupNorm == reference CachedGroupNorm in stream mode
    (SimpleNetsStream.py:96-147): normalise [prev_chunk | chunk], emit the
    chunk, keep the last chunk as pad."""
    import jax
    import jax.numpy as jnp
    import torch
    from ref_loader import load_reference_codec_module

    sns = load_reference_codec_module()
    C, T, B, G = 8, 16, 2, 4
    ref = sns.CachedGroupNorm(G, C, stream=True)
    torch.manual_seed(0)
    with torch.no_grad():
        ref.gn.weight.copy_(torch.randn(C) * 0.5 + 1.0)
        ref.gn.bias.copy_(torch.randn(C) * 0.1)
    ref.eval()

    from after_tpu.models.autoencoder import StreamGroupNorm
    mod = StreamGroupNorm(G, streaming=True)
    x0 = jnp.zeros((B, T, C))
    variables = mod.init(jax.random.PRNGKey(0), x0)
    params = {"gn": {"scale": jnp.asarray(ref.gn.weight.detach().numpy()),
                     "bias": jnp.asarray(ref.gn.bias.detach().numpy())}}
    cache = jax.tree_util.tree_map(jnp.zeros_like, variables["cache"])

    rng = np.random.RandomState(1)
    for i in range(4):
        x = rng.randn(B, T, C).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 2, 1)))
        y_ref = y_ref.numpy().transpose(0, 2, 1)
        y, aux = mod.apply({"params": params, "cache": cache},
                           jnp.asarray(x), mutable=["cache"])
        cache = aux["cache"]
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5,
                                   err_msg=f"chunk {i}")


@pytest.mark.slow
def test_beat_this_parity():
    """BeatThis port == reference network (beat_tracker.py) with the same
    (random) weights: stem, partial F/T RoFormers, transformer, SumHead."""
    import jax
    import jax.numpy as jnp
    import torch
    from ref_loader import load_reference_beat_this

    bt = load_reference_beat_this()
    torch.manual_seed(0)
    ref = bt.BeatThis()
    ref.eval()

    from after_tpu.dataset.beat_tracker import BeatThis, map_torch_state_dict
    mine = BeatThis()
    variables = map_torch_state_dict(ref.state_dict())

    rng = np.random.RandomState(0)
    spect = rng.randn(2, 96, 128).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(spect))
    out = mine.apply(variables, jnp.asarray(spect))
    for k in ("beat", "downbeat"):
        a, b = np.asarray(out[k]), out_ref[k].numpy()
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=5e-4,
                                   err_msg=f"head {k}")


@pytest.mark.slow
def test_beat_this_audio2beats_smoke():
    """End-to-end Audio2Beats with random weights: runs, returns sorted
    times within the clip."""
    from after_tpu.dataset.beat_tracker import Audio2Beats

    a2b = Audio2Beats()
    x = np.random.RandomState(0).randn(22050 * 3).astype(np.float32) * 0.1
    beats, downs = a2b(x, 22050)
    assert (np.diff(beats) > 0).all() if len(beats) > 1 else True
    assert all(0 <= b <= 3.5 for b in beats)
    assert all(d in beats for d in downs) or len(downs) == 0


def test_import_torch_cli_full_diffusion_and_transfer(tmp_path,
                                                      ref_transformerv2):
    """One `import_torch` CLI call ports a COMPLETE reference diffusion
    checkpoint (net + encoder + encoder_time + classifier; composition as in
    reference train.py:88-95), and TransferPipeline.transfer runs end to end
    on it together with a CLI-imported codec."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    from ref_loader import (load_reference_codec_module,
                            load_reference_ecapa, load_reference_encoder1d)

    from after_tpu.cli.main import main as cli_main
    from after_tpu.config import Encoder1DConfig, get_config, with_overrides
    from after_tpu.diffusion.pipeline import TransferPipeline
    from after_tpu.models import Encoder1D
    from after_tpu.utils.checkpoint import restore_checkpoint

    torch.manual_seed(0)
    dn = ref_transformerv2.DenoiserV2(
        n_channels=8, seq_len=32, embed_dim=128, cond_dim=6, tcond_dim=12,
        noise_embed_dims=32, n_layers=2, mlp_multiplier=2, dropout=0.0,
        causal=True, pos_emb_type="rotary", local_attention_size=8,
        attention_chunk_size=4).eval()
    ecapa_mod = load_reference_ecapa()
    enc = ecapa_mod.ECAPATDNN(
        in_size=8, out_dim=6, channels=[32, 32, 32, 64],
        kernel_sizes=[3, 3, 3, 3], dilations=[1, 1, 1, 1],
        groups=[1, 1, 1, 1], res2net_scale=8, se_channels=16,
        attention_channels=16, global_context=True, pooling=True,
        use_tanh=False, spherical_normalisation=False,
        regularisation="ac").eval()
    e1d_mod = load_reference_encoder1d()
    enc_t = e1d_mod.Encoder1D(in_size=8, channels=[16, 16, 12],
                              ratios=[1, 1], kernel_size=5, use_tanh=False,
                              average_out=False, upscale_out=False,
                              ac_regularisation=True).eval()
    cls = e1d_mod.Encoder1D(in_size=12, channels=[16, 6], ratios=[1],
                            kernel_size=5, average_out=True,
                            ac_regularisation=True).eval()

    sd = {}
    for pref, m in [("net.", dn), ("encoder.", enc),
                    ("encoder_time.", enc_t), ("classifier.", cls)]:
        sd.update({pref + k: v for k, v in m.state_dict().items()})
    pt = tmp_path / "checkpoint100000_EMA.pt"
    torch.save({"model_state": sd}, str(pt))

    out = tmp_path / "imported"
    rc = cli_main(["import_torch", "--checkpoint", str(pt), "--type",
                   "diffusion", "--n_layers", "2", "--n_ecapa_blocks", "4",
                   "--out", str(out)])
    assert rc == 0
    variables = restore_checkpoint(str(out))["variables"]
    assert {"net", "encoder", "encoder_time", "classifier"} <= set(variables)

    # encoder_time survives the CLI + orbax round trip exactly
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 8).astype(np.float32)
    with torch.no_grad():
        z_ref = enc_t(torch.from_numpy(x.transpose(0, 2, 1)))
    cfg_et = Encoder1DConfig(in_size=8, channels=(16, 16, 12), ratios=(1, 1),
                             kernel_size=5, causal=False)
    z, _, _ = Encoder1D(cfg_et).apply(
        jax.tree_util.tree_map(jnp.asarray, dict(variables["encoder_time"])),
        jnp.asarray(x))
    mse = float(np.mean((np.asarray(z)
                         - z_ref.numpy().transpose(0, 2, 1)) ** 2))
    assert mse < 1e-6, f"encoder_time CLI round-trip MSE {mse}"

    # codec import (norm-free streaming variant exercises --use_norm 0)
    sns = load_reference_codec_module()
    codec_ref = sns.AutoEncoder(
        in_channels=4, channels=8, z_channels=8, multipliers=[1, 2, 2],
        factors=[2, 2], dilations=[1, 3, 9], kernel_size=3,
        bottleneck=sns.ReluBottleneck(sigma=0.0, scale=3), use_norm=False,
        decoder_ratio=1.5, pqmf_bands=4, use_loudness=True,
        use_noise=False).eval()
    pt_codec = tmp_path / "codec.pt"
    torch.save(codec_ref.state_dict(), str(pt_codec))
    out_codec = tmp_path / "imported_codec"
    rc = cli_main(["import_torch", "--checkpoint", str(pt_codec), "--type",
                   "codec", "--n_stages", "2", "--use_norm", "0",
                   "--out", str(out_codec)])
    assert rc == 0
    codec_vars = restore_checkpoint(str(out_codec))["codec_vars"]

    cfg = get_config("tiny")
    cfg = with_overrides(cfg, {
        "denoiser.embed_dim": 128, "denoiser.n_layers": 2,
        "denoiser.noise_embed_dims": 32, "denoiser.mlp_multiplier": 2,
        "denoiser.dropout": 0.0,
        "encoder.channels": (32, 32, 32, 64), "encoder.se_channels": 16,
        "encoder.attention_channels": 16,
        "encoder_time.channels": (16, 16, 12),
        "encoder_time.ratios": (1, 1), "encoder_time.causal": False,
        "classifier.in_size": 12, "classifier.channels": (16, 6),
        "classifier.ratios": (1,), "classifier.average_out": True,
        "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
        "autoencoder.base_channels": 8,
        "autoencoder.multipliers": (1, 2, 2), "autoencoder.factors": (2, 2),
        "autoencoder.dilations": (1, 3, 9),
        "autoencoder.num_blocks_per_stage": 3,
        "autoencoder.use_norm": False, "autoencoder.decoder_ratio": 1.5,
        "autoencoder.bottleneck": "relu",
        "autoencoder.bottleneck_sigma": 0.0,
    }).resolved(in_size=8, n_signal=32)

    pipe = TransferPipeline(cfg)
    pvars = {"codec": jax.tree_util.tree_map(jnp.asarray, dict(codec_vars)),
             "diffusion": jax.tree_util.tree_map(jnp.asarray,
                                                 dict(variables))}
    T = cfg.autoencoder.ratio * 32
    a_struct = jnp.asarray(0.1 * rng.randn(1, T, 1).astype(np.float32))
    a_timbre = jnp.asarray(0.1 * rng.randn(1, T, 1).astype(np.float32))
    y = pipe.transfer(pvars, a_struct, a_timbre, 2)
    y = np.asarray(y)
    assert y.shape[0] == 1 and y.shape[2] == 1
    assert np.isfinite(y).all()


def test_import_torch_autoconfig_from_gin(tmp_path):
    """VERDICT r2 #8: `import_torch --checkpoint --type --out` alone derives
    the architecture from the run's config.gin (reference export.py:69-77)
    and writes the derived config.json next to the imported checkpoint."""
    import json

    sys.path.insert(0, "tests")
    from ref_loader import load_reference_codec_module

    from after_tpu.cli.main import main as cli_main
    from after_tpu.config import load_codec_config
    from after_tpu.utils.checkpoint import restore_checkpoint

    torch.manual_seed(1)
    sns = load_reference_codec_module()
    codec_ref = sns.AutoEncoder(
        in_channels=4, channels=8, z_channels=8, multipliers=[1, 2, 2],
        factors=[2, 2], dilations=[1, 3, 9], kernel_size=3,
        bottleneck=sns.ReluBottleneck(sigma=0.0, scale=3), use_norm=False,
        decoder_ratio=1.5, pqmf_bands=4, use_loudness=True,
        use_noise=False).eval()
    run = tmp_path / "ref_run"
    run.mkdir()
    torch.save(codec_ref.state_dict(), str(run / "checkpoint500000.pt"))
    (run / "config.gin").write_text("""
SR = 44100
LATENT_SIZE = 8
cached_conv.get_padding:
    mode = "causal"
SimpleNetsStream.AutoEncoder:
    z_channels = %LATENT_SIZE
    channels = 8
    pqmf_bands = 4
    multipliers = [1, 2, 2]
    factors = [2, 2]
    dilations = [1, 3, 9]
    use_norm = False
    use_loudness = True
    use_noise = False
""")

    out = tmp_path / "imported"
    rc = cli_main(["import_torch", "--checkpoint",
                   str(run / "checkpoint500000.pt"), "--type", "codec",
                   "--out", str(out)])
    assert rc == 0
    # geometry derived: 2 stages, 2 blocks/stage, norm-free — the restore
    # would fail or mis-shape with the old defaults (5 stages, 3 blocks)
    codec_vars = restore_checkpoint(str(out))["codec_vars"]
    enc = codec_vars["params"]["encoder"]
    assert {"to_in", "down_0", "down_1", "act", "to_out"} <= set(enc)
    assert "down_2" not in enc
    assert {"res_0", "res_1", "res_2", "act", "down"} == set(enc["down_0"])

    # the derived config.json makes the dir a first-class codec run dir
    cfg = load_codec_config(str(out))
    assert cfg.z_channels == 8 and cfg.factors == (2, 2)
    assert cfg.causal is True and cfg.use_norm is False
