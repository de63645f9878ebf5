"""Streaming latency benchmark: per-buffer wall time of the fused streaming
step (structure+timbre+diffuse+decode) at base-config sizes on one chip.

Real-time budget per buffer = chunk_size * ratio / sr  (4*2048/44100 = 186ms).

VOICES=1,4,8 benches batched serving (B parallel voices through ONE fused
graph — the serving sweet spot: codec decode alone hits 3,263x aggregate
realtime at batch 16, PARITY.md); for each B it reports the per-buffer
latency and the aggregate realtime factor B*budget/latency.

Readback slimming: the per-buffer device->host audio transfer is benched
both as f32 and as on-device int16 PCM (4x smaller over the relay's slow
device->host path; the native host consumes either).
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming.streamer import Streamer

NB_STEPS = int(os.environ.get("NB_STEPS", "1"))
VOICES = [int(v) for v in os.environ.get("VOICES", "1,4,8").split(",")]
cfg = get_config("base")
cfg = with_overrides(cfg, {"autoencoder.causal": True,
                           "autoencoder.use_norm": False})
cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels, n_signal=128)
streamer = Streamer(cfg, chunk_size=4)
pipe = TransferPipeline(cfg)
print("init...", file=sys.stderr, flush=True)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
jax.block_until_ready(variables)


@jax.jit
def to_pcm16(x):
    """On-device int16 PCM cast: the readback crossing the relay is 4x
    smaller than f32 audio."""
    return (jnp.clip(x, -1, 1) * 32767.0).astype(jnp.int16)


budget_ms = streamer.audio_chunk / cfg.sr * 1000
results = {}
for B in VOICES:
    state = streamer.init_state(variables, B)
    audio = jnp.zeros((B, streamer.audio_chunk, 1))
    print(f"compile B={B}...", file=sys.stderr, flush=True)
    out, state = streamer.forward(variables, state, audio, audio, NB_STEPS)
    jax.block_until_ready(out)
    _ = np.asarray(to_pcm16(out))
    # the axon relay acks block_until_ready before execution completes
    # (CLAUDE.md) — each iteration must READ BACK a value that depends on
    # the full step.  Calls already chain through `state`, so device work
    # serializes; the readback makes the wall clock honest.
    ts, ts_full, ts_i16 = [], [], []
    for i in range(20):
        t0 = time.perf_counter()
        out, state = streamer.forward(variables, state, audio, audio,
                                      NB_STEPS)
        _ = float(jax.device_get(out[0, -1, 0]))   # scalar readback
        ts.append(time.perf_counter() - t0)
    for i in range(10):
        t0 = time.perf_counter()
        out, state = streamer.forward(variables, state, audio, audio,
                                      NB_STEPS)
        _ = np.asarray(out)                        # full f32 readback
        ts_full.append(time.perf_counter() - t0)
    for i in range(10):
        t0 = time.perf_counter()
        out, state = streamer.forward(variables, state, audio, audio,
                                      NB_STEPS)
        _ = np.asarray(to_pcm16(out))              # int16 PCM readback
        ts_i16.append(time.perf_counter() - t0)
    lat = float(np.median(ts) * 1000)
    lat_full = float(np.median(ts_full) * 1000)
    lat_i16 = float(np.median(ts_i16) * 1000)
    results[B] = {
        "device_ms": round(lat, 2),
        "f32_readback_ms": round(lat_full, 2),
        "int16_readback_ms": round(lat_i16, 2),
        "aggregate_rtf_device": round(B * budget_ms / lat, 1),
        "aggregate_rtf_int16": round(B * budget_ms / lat_i16, 1),
        "realtime_ok": lat_i16 < budget_ms,
    }
    print(f"B={B}: {results[B]}", file=sys.stderr, flush=True)

b1 = results.get(1) or results[VOICES[0]]
print(json.dumps({
    "metric": "streaming_buffer_latency",
    "value": b1["device_ms"],
    "unit": "ms (budget %.0f ms, %d diffusion steps)" % (budget_ms, NB_STEPS),
    "with_full_audio_readback_ms": b1["f32_readback_ms"],
    "with_int16_readback_ms": b1["int16_readback_ms"],
    "realtime_ok": b1["realtime_ok"],
    "batched_voices": {str(b): r for b, r in results.items()},
}))
