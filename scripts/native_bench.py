"""Production-scale native host benchmark: export BASE-size streaming
artifacts (random weights; perf only — tiny-size parity is pinned by
scripts/native_check.py) and stream ~12 s of audio through
native/stream_host (PJRT C API), reporting its compile time and
per-buffer latency vs the 186 ms real-time budget."""
import json, os, subprocess, sys, time, uuid
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.streaming.export import export_streamer
from after_tpu.dataset.audio import load_wav, save_wav

NB_STEPS = int(os.environ.get("NB_STEPS", "1"))
N_CHUNKS = int(os.environ.get("N_CHUNKS", "64"))

cfg = get_config("base")
cfg = with_overrides(cfg, {"autoencoder.causal": True,
                           "autoencoder.use_norm": False})
cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels, n_signal=128)
pipe = TransferPipeline(cfg)
print("init...", file=sys.stderr, flush=True)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
jax.block_until_ready(variables)
streamer = Streamer(cfg, chunk_size=4)

art = "/tmp/native_base_art"
import shutil; shutil.rmtree(art, ignore_errors=True)
t0 = time.perf_counter()
export_streamer(streamer, variables, art, nb_steps=NB_STEPS,
                donate_state=True)
print(f"export {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

A = streamer.audio_chunk
rng = np.random.RandomState(0)
save_wav("/tmp/nb_s.wav", (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32),
         cfg.sr)
save_wav("/tmp/nb_t.wav", (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32),
         cfg.sr)

env = dict(os.environ)
env["AFTER_PJRT_OPTIONS"] = ("remote_compile=1;local_only=0;priority=0;"
                             "topology=v5e:1x1x1;n_slices=1;"
                             f"session_id={uuid.uuid4()};rank=4294967295")
env["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
env["AXON_LOOPBACK_RELAY"] = "1"
t0 = time.perf_counter()
r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "/tmp/nb_s.wav",
                    "/tmp/nb_t.wav", "/tmp/nb_out.wav"],
                   env=env, capture_output=True, text=True, timeout=3600)
print(r.stderr[-1500:], file=sys.stderr, flush=True)
assert r.returncode == 0, r.returncode
out, _ = load_wav("/tmp/nb_out.wav")
assert np.isfinite(out).all() and len(out) == N_CHUNKS * A
stream_line = [l for l in r.stderr.splitlines() if "] stream " in l][0]
compile_line = [l for l in r.stderr.splitlines() if "] compile " in l][0]
ms_per_buffer = float(stream_line.split(",")[1].strip().split(" ")[0])
budget_ms = A / cfg.sr * 1e3
print(json.dumps({
    "metric": "native_host_base_size", "nb_steps": NB_STEPS,
    "n_chunks": N_CHUNKS,
    "compile_s": round(float(compile_line.split("compile ")[1].split(" ")[0]), 1),
    "ms_per_buffer": ms_per_buffer,
    "budget_ms_per_buffer": round(budget_ms, 1),
    "realtime_headroom": round(budget_ms / ms_per_buffer, 2)}))
