"""gin config derivation for import_torch (reference export.py:69-77 parses
the run's own config.gin the same way)."""

import numpy as np


def test_parse_reference_baseae_gin():
    from after_tpu.utils.gin_import import codec_config_from_gin, parse_gin

    path = "/root/reference/after/autoencoder/configs/baseAE.gin"
    b = parse_gin(path)
    assert b["SimpleNetsStream.AutoEncoder.z_channels"] == 64  # %LATENT_SIZE
    assert b["SimpleNetsStream.AutoEncoder.factors"] == [2, 2, 2, 4, 4]

    cfg = codec_config_from_gin(path)
    assert cfg.pqmf_bands == 16
    assert cfg.z_channels == 64
    assert cfg.base_channels == 64
    assert cfg.multipliers == (1, 2, 4, 4, 8, 8)
    assert cfg.factors == (2, 2, 2, 4, 4)
    assert cfg.dilations == (1, 3, 9)
    assert cfg.use_norm is True
    assert cfg.bottleneck == "relu"
    assert cfg.causal is False        # baseAE keeps centered padding
    assert cfg.sr == 44100


def test_parse_reference_diffusion_base_gin():
    from after_tpu.utils.gin_import import diffusion_config_from_gin

    cfg = diffusion_config_from_gin(
        "/root/reference/after/diffusion/configs/base.gin")
    assert cfg.denoiser.n_layers == 6
    assert cfg.denoiser.embed_dim == 512
    assert cfg.denoiser.mlp_multiplier == 3
    assert cfg.encoder.channels == (512, 512, 512, 1024)
    assert cfg.encoder.res2net_scale == 8
    # scoped Encoder1D bindings resolve per scope, %macros substituted
    assert cfg.encoder_time.channels == (64, 128, 256, 512, 12)
    assert cfg.classifier.channels == (64, 64, 64, 64, 6)
    assert cfg.classifier.average_out is True
    assert cfg.zs_channels == 12 and cfg.zt_channels == 6
    assert cfg.structure_type == "audio"


def test_gin_causal_padding_and_overrides(tmp_path):
    from after_tpu.utils.gin_import import (codec_config_from_gin,
                                            find_gin_config)

    gin = tmp_path / "config.gin"
    gin.write_text("""
SR = 22050
LATENT_SIZE = 8

cached_conv.get_padding:
    mode = "causal"

SimpleNetsStream.AutoEncoder:
    z_channels = %LATENT_SIZE
    channels = 8
    pqmf_bands = 4
    multipliers = [1, 2, 2]
    factors = [2, 2]
    dilations = [1, 3]
    use_norm = False
""")
    cfg = codec_config_from_gin(str(gin))
    assert cfg.causal is True
    assert cfg.sr == 22050
    assert cfg.z_channels == 8 and cfg.base_channels == 8
    assert cfg.factors == (2, 2) and cfg.dilations == (1, 3)
    assert cfg.use_norm is False

    ckpt = tmp_path / "checkpoint500000.pt"
    ckpt.write_bytes(b"")
    assert find_gin_config(str(ckpt)) == str(gin)
    assert find_gin_config("/tmp/nowhere/x.pt") is None
