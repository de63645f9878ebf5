from .denoiser import Denoiser, fourier_features
from .encoder import Encoder1D, LinearEncoder
from .ecapa import ECAPAEncoder
from .autoencoder import AudioCodec, CodecDecoder, CodecEncoder
from .denoiser_v1 import DenoiserV1, DenoiserV1Config
from .unet1d import UNet1D, UNet1DConfig
from .discriminator import EncodecDiscriminator


def make_denoiser(dcfg, streaming: bool = False):
    """Build the configured denoiser backbone (the reference's gin-selectable
    net slot: DenoiserV2 / Denoiser v1 / UNET1D).

    Returns None for (arch="unet1d", streaming=True): the conv UNet has no
    streaming caches — same limitation as the reference's UNET1D.
    """
    if dcfg.arch == "v2":
        return Denoiser(dcfg, streaming=streaming)
    if dcfg.arch == "v1":
        v1 = DenoiserV1Config(
            base=dcfg, tcond_mode=dcfg.v1_tcond_mode,
            temporal_noise=dcfg.v1_temporal_noise, mlp_type=dcfg.v1_mlp_type,
            cross_attn_causal=dcfg.v1_cross_attn_causal)
        return DenoiserV1(v1, streaming=streaming)
    if dcfg.arch == "unet1d":
        if streaming:
            return None
        return UNet1D(UNet1DConfig(
            in_size=dcfg.n_channels, channels=dcfg.unet_channels,
            ratios=dcfg.unet_ratios, kernel_size=dcfg.unet_kernel_size,
            time_channels=dcfg.noise_embed_dims,
            time_cond_in_channels=dcfg.tcond_dim,
            time_cond_channels=dcfg.unet_time_cond_channels,
            cond_channels=dcfg.cond_dim))
    raise ValueError(f"unknown denoiser arch {dcfg.arch!r} "
                     "(expected 'v2' | 'v1' | 'unet1d')")
