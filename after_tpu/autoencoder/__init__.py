from .losses import (multi_resolution_stft_loss, spectral_distance, stft_loss,
                     waveform_distance)
from .trainer import AETrainState, AutoencoderTrainer
