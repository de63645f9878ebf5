"""A/B the native host's readback pipeline depth in ONE session.

Exports the base-size streaming artifact once (reused if present), then
runs native/stream_host repeatedly with different AFTER_NATIVE_PIPELINE
depths in mirrored order (1,2,4,4,2,1) so relay session drift cancels.
Reports ms/buffer per depth.
"""
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

N_CHUNKS = int(os.environ.get("N_CHUNKS", "24"))
DEPTHS = [int(d) for d in os.environ.get("DEPTHS", "1,2,4,4,2,1").split(",")]

art = "/tmp/native_base_art"
cfg = get_config("base")
cfg = with_overrides(cfg, {"autoencoder.causal": True,
                           "autoencoder.use_norm": False})
cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels, n_signal=128)
streamer = Streamer(cfg, chunk_size=4)
# reuse only an artifact exported with the same nb_steps default (a stale
# /tmp artifact from e.g. NB_STEPS=4 native_bench.py would silently change
# what this A/B measures)
reuse = False
mpath = os.path.join(art, "manifest.json")
if os.path.exists(mpath):
    reuse = json.load(open(mpath)).get("nb_steps") == 1
    if not reuse:
        print("stale artifact (nb_steps != 1): re-exporting",
              file=sys.stderr, flush=True)
if not reuse:
    import shutil
    shutil.rmtree(art, ignore_errors=True)
    pipe = TransferPipeline(cfg)
    print("init...", file=sys.stderr, flush=True)
    variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
    jax.block_until_ready(variables)
    t0 = time.perf_counter()
    export_streamer(streamer, variables, art, nb_steps=1, donate_state=True)
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

results = {}
for depth in DEPTHS:
    env["AFTER_NATIVE_PIPELINE"] = str(depth)
    r = subprocess.run(["/root/repo/native/stream_host", art,
                        "/opt/axon/libaxon_pjrt.so", "/tmp/nb_s.wav",
                        "/tmp/nb_t.wav", "/tmp/nb_out.wav"],
                       env=env, capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stderr.splitlines() if "] stream " in l][0]
    ms = float(line.split(",")[1].strip().split(" ")[0])
    out, _ = load_wav("/tmp/nb_out.wav")
    assert np.isfinite(out).all() and len(out) == N_CHUNKS * A
    results.setdefault(depth, []).append(ms)
    print(f"depth {depth}: {ms:.1f} ms/buffer", file=sys.stderr, flush=True)

print(json.dumps({"metric": "native_pipeline_ab", "n_chunks": N_CHUNKS,
                  "ms_per_buffer": {str(k): [round(v, 1) for v in vs]
                                    for k, vs in sorted(results.items())}}))
