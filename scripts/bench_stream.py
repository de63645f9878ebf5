"""Streaming latency benchmark: per-buffer wall time of the fused streaming
step (structure+timbre+diffuse+decode) at base-config sizes on one chip.

Real-time budget per buffer = chunk_size * ratio / sr  (4*2048/44100 = 186ms).
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming.streamer import Streamer

NB_STEPS = int(os.environ.get("NB_STEPS", "1"))
cfg = get_config("base")
cfg = with_overrides(cfg, {"autoencoder.causal": True,
                           "autoencoder.use_norm": False})
cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels, n_signal=128)
streamer = Streamer(cfg, chunk_size=4)
pipe = TransferPipeline(cfg)
print("init...", file=sys.stderr, flush=True)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
jax.block_until_ready(variables)
state = streamer.init_state(variables, 1)
audio = jnp.zeros((1, streamer.audio_chunk, 1))
print("compile...", file=sys.stderr, flush=True)
out, state = streamer.forward(variables, state, audio, audio, NB_STEPS)
jax.block_until_ready(out)
# the axon relay acks block_until_ready before execution completes
# (CLAUDE.md) — each iteration must READ BACK a value that depends on the
# full step.  Calls already chain through `state`, so device work
# serializes; the readback makes the wall clock honest.
ts, ts_full = [], []
for i in range(20):
    t0 = time.perf_counter()
    out, state = streamer.forward(variables, state, audio, audio, NB_STEPS)
    _ = float(jax.device_get(out[0, -1, 0]))   # scalar readback
    ts.append(time.perf_counter() - t0)
for i in range(10):
    t0 = time.perf_counter()
    out, state = streamer.forward(variables, state, audio, audio, NB_STEPS)
    _ = np.asarray(out)                        # full audio buffer readback
    ts_full.append(time.perf_counter() - t0)
budget_ms = streamer.audio_chunk / cfg.sr * 1000
lat_ms = float(np.median(ts) * 1000)
lat_full_ms = float(np.median(ts_full) * 1000)
print(json.dumps({
    "metric": "streaming_buffer_latency",
    "value": round(lat_ms, 2), "unit": "ms (budget %.0f ms, %d diffusion steps)"
        % (budget_ms, NB_STEPS),
    "with_full_audio_readback_ms": round(lat_full_ms, 2),
    "realtime_ok": lat_full_ms < budget_ms,
}))
