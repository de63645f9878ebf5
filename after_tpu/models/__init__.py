from .denoiser import Denoiser, fourier_features
from .encoder import Encoder1D, LinearEncoder
from .ecapa import ECAPAEncoder
from .autoencoder import AudioCodec, CodecDecoder, CodecEncoder
