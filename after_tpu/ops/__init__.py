from .conv import StreamConv1d, StreamConvTranspose1d, get_padding, conv_delay
from .pqmf import PQMF
from .snake import Snake, SnakeBeta, snake_beta
from .masks import (chunkwise_causal_mask, sliding_chunkwise_mask, mask_bias,
                    streaming_mask)
from .rotary import apply_rotary, rotary_angles, rotate_q_with_cached_k
from . import stft
