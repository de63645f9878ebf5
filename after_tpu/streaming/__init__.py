from .state import init_stream_state, zero_cache
from .streamer import Streamer, StreamState
