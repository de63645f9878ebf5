"""Benchmark: audio-to-audio timbre transfer real-time factor on one chip.

Measures the full offline transfer pipeline (codec encode x2 -> timbre +
structure encoders -> 20-step rectified-flow Euler sampler with 3-way CFG ->
codec decode) on one 524288-sample (~11.9 s @ 44.1 kHz) chunk with the
base-config model sizes (DenoiserV2 512x6, ECAPA [512,512,512,1024], 64-ch
codec at 2048:1) — the reference's offline demo workload
(/root/reference/notebooks/audio_to_audio_demo.ipynb, 20 steps).

MEASUREMENT METHODOLOGY (hard-won, see CLAUDE.md):
`jax.block_until_ready` through the sandbox's axon relay acknowledges
BEFORE device execution completes, and the relay deduplicates identical
pure execute requests — a burst loop of repeated identical calls measures
pure dispatch rate (it "beat" the chip's own roofline by 2x: 377 TFLOP/s
on a 197-peak v5e, and 100 diffusion steps timed the same as 20).  The
honest numbers here come from:
- device-side time: dependency-CHAINED calls (each transfer consumes the
  previous output) timed by the slope between chain lengths, with a host
  readback (np.asarray) at the end forcing true completion;
- end-to-end time: a single call + full host readback.

Prints one JSON line; `value` is the device-side real-time factor and
vs_baseline measures it against the 50x north-star target (BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: first-ever run pays ~5 min of XLA compiles
# (large conv graphs); subsequent runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from after_tpu.config import get_config
    from after_tpu.diffusion import TransferPipeline

    SR = 44100
    N_SAMPLES = 524288
    NB_STEPS = 20
    # AFTER_BENCH_BATCH=k measures k transfers batched through one graph
    # (offline batch serving); the driver's headline stays batch 1.
    BATCH = int(os.environ.get("AFTER_BENCH_BATCH", "1"))
    # bf16 measured ~6% slower at batch 1 with honest chained timing (the
    # workload is latency-bound, not weight-bandwidth-bound), so f32 stays
    # the default.
    dtype = os.environ.get("AFTER_BENCH_DTYPE", "float32")

    cfg = get_config("base")
    ratio = cfg.autoencoder.ratio            # 2048
    n_signal = N_SAMPLES // ratio            # 256 latent frames
    cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels, n_signal=n_signal)

    pipe = TransferPipeline(
        cfg, compute_dtype=None if dtype in ("f32", "float32") else dtype)
    log("bench: initializing params (jitted)...")
    t0 = time.perf_counter()
    variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0),
                                                     BATCH)
    variables = pipe.prepare_variables(variables)
    jax.block_until_ready(variables)
    log(f"bench: init {time.perf_counter() - t0:.1f}s ({dtype})")

    rng = np.random.RandomState(0)
    a = jnp.asarray(0.1 * rng.randn(BATCH, N_SAMPLES, 1).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(BATCH, N_SAMPLES, 1).astype(np.float32))
    keys = [jax.random.PRNGKey(i) for i in range(512)]
    ki = 0

    log("bench: compiling transfer graph...")
    t0 = time.perf_counter()
    out = pipe.transfer(variables, a, b, NB_STEPS, rng=keys[ki])
    ki += 1
    _ = np.asarray(out)
    log(f"bench: compile+first run {time.perf_counter() - t0:.1f}s")
    try:
        ca = type(pipe).transfer.lower(
            pipe, variables, a, b, NB_STEPS,
            rng=keys[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0

    # device-side: chained dependency slope (see module docstring)
    chain_times = {}
    for chain in (2, 12):
        ts = []
        for _ in range(3):
            y = a
            t0 = time.perf_counter()
            for _ in range(chain):
                y = pipe.transfer(variables, y, b, NB_STEPS, rng=keys[ki])
                ki += 1
            _ = np.asarray(y)
            ts.append(time.perf_counter() - t0)
        chain_times[chain] = min(ts)
        log(f"bench: chain={chain} total {min(ts) * 1e3:.1f} ms")
    dt_device = (chain_times[12] - chain_times[2]) / 10

    # end-to-end: single call + full readback (includes the relay round
    # trip and the 2 MB device->host audio transfer)
    e2e = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = pipe.transfer(variables, a, b, NB_STEPS, rng=keys[ki])
        ki += 1
        _ = np.asarray(out)
        e2e.append(time.perf_counter() - t0)
    dt_e2e = sorted(e2e)[len(e2e) // 2]
    log(f"bench: e2e per-call ms {[round(t * 1e3, 1) for t in sorted(e2e)]}")

    # readback slimming A/B: int16 PCM cast on device -> 4x less data over
    # the relay's slow device->host path (the deployed audio consumer)
    to_pcm16 = jax.jit(
        lambda x: (jnp.clip(x, -1, 1) * 32767.0).astype(jnp.int16))
    _ = np.asarray(to_pcm16(out))
    e2e16 = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = pipe.transfer(variables, a, b, NB_STEPS, rng=keys[ki])
        ki += 1
        _ = np.asarray(to_pcm16(out))
        e2e16.append(time.perf_counter() - t0)
    dt_e2e16 = sorted(e2e16)[len(e2e16) // 2]
    log(f"bench: e2e int16 per-call ms "
        f"{[round(t * 1e3, 1) for t in sorted(e2e16)]}")

    audio_seconds = BATCH * N_SAMPLES / SR
    rtf = audio_seconds / dt_device
    rec = {
        "metric": "a2a_transfer_realtime_factor",
        "value": round(rtf, 2),
        "unit": (f"x_realtime(44.1kHz, 20 diffusion steps, "
                 f"batch {BATCH}, device-side)"),
        "vs_baseline": round(rtf / 50.0, 3),
        "device_ms_per_call": round(dt_device * 1e3, 2),
        "end_to_end_ms_per_call": round(dt_e2e * 1e3, 2),
        "end_to_end_rtf": round(audio_seconds / dt_e2e, 1),
        "end_to_end_int16_ms_per_call": round(dt_e2e16 * 1e3, 2),
        "end_to_end_int16_rtf": round(audio_seconds / dt_e2e16, 1),
    }
    if flops:
        rec["tflops_per_sec"] = round(flops / dt_device / 1e12, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
