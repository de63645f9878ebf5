from .denoiser import Denoiser, fourier_features
from .encoder import Encoder1D, LinearEncoder
from .ecapa import ECAPAEncoder
from .autoencoder import AudioCodec, CodecDecoder, CodecEncoder
from .denoiser_v1 import DenoiserV1, DenoiserV1Config
from .unet1d import UNet1D, UNet1DConfig
from .discriminator import EncodecDiscriminator
