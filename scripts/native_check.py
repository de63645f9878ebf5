"""Export tiny donated streaming artifact on TPU, run native host, compare."""
import os, sys, subprocess, uuid
sys.path.insert(0, "/root/repo")
import jax
import os
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.streaming.export import export_streamer
from after_tpu.dataset.audio import save_wav, load_wav

cfg = get_config("tiny", "streaming")
cfg = with_overrides(cfg, {
    "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
    "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
    "encoder.channels": (16, 16, 16, 32),
    "encoder_time.channels": (16, 16, 16, 16, 12),
    "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
    "autoencoder.base_channels": 8, "autoencoder.multipliers": (1, 2, 2),
    "autoencoder.factors": (2, 2), "autoencoder.dilations": (1, 3),
    "autoencoder.num_blocks_per_stage": 1,
    "train.n_signal": 16,
}).resolved(in_size=8, n_signal=16)
pipe = TransferPipeline(cfg)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
streamer = Streamer(cfg, chunk_size=4)

art = "/tmp/native_art"
import shutil; shutil.rmtree(art, ignore_errors=True)
export_streamer(streamer, variables, art, nb_steps=2, donate_state=True)
print("exported", flush=True)

A = streamer.audio_chunk
N_CHUNKS = 6
rng = np.random.RandomState(0)
s = (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32)
t = (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32)
save_wav("/tmp/na_s.wav", s, cfg.sr)
save_wav("/tmp/na_t.wav", t, cfg.sr)

# python reference via live streamer with the SAME per-chunk rng convention
# as the native host (key data [chunk_index+1, 42]); read back the int16
# wavs so both hosts see identical (quantized) inputs
s, _ = load_wav("/tmp/na_s.wav")
t, _ = load_wav("/tmp/na_t.wav")
state = streamer.init_state(variables)
outs = []
for c in range(N_CHUNKS):
    sl = slice(c * A, (c + 1) * A)
    key = jax.random.wrap_key_data(
        jnp.asarray([c + 1, 42], jnp.uint32))
    zs, state = streamer.structure(variables, state,
                                   jnp.asarray(s[sl]).reshape(1, A, 1))
    zt, state = streamer.timbre(variables, state,
                                jnp.asarray(t[sl]).reshape(1, A, 1))
    z, state = streamer.diffuse(variables, state, zs, zt, 2, rng=key)
    y, state = streamer.decode(variables, state, z)
    outs.append(np.asarray(y).ravel())
ref = np.concatenate(outs)
np.save("/tmp/na_ref.npy", ref)
print("python host done", flush=True)

env = dict(os.environ)
env["AFTER_PJRT_OPTIONS"] = ("remote_compile=1;local_only=0;priority=0;"
                             "topology=v5e:1x1x1;n_slices=1;"
                             f"session_id={uuid.uuid4()};rank=4294967295")
env["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
env["AXON_LOOPBACK_RELAY"] = "1"
r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "/tmp/na_s.wav",
                    "/tmp/na_t.wav", "/tmp/na_out.wav"],
                   env=env, capture_output=True, text=True, timeout=1200)
print(r.stderr[-2000:], flush=True)
assert r.returncode == 0, r.returncode
out, _ = load_wav("/tmp/na_out.wav")
n = min(len(out), len(ref))
err = np.abs(out[:n] - ref[:n]).max()
print(f"native vs python maxdiff = {err:.2e} over {n} samples")
assert err < 2e-4, err
print("NATIVE DONATED-STATE OK")

# live PCM mode: same (int16-quantized) inputs interleaved over stdin,
# mono f32 frames on stdout; must match the file-mode/Python reference.
pcm_in = np.empty(2 * n, np.float32)
pcm_in[0::2] = s[:n]
pcm_in[1::2] = t[:n]
env["AFTER_PJRT_OPTIONS"] = ("remote_compile=1;local_only=0;priority=0;"
                             "topology=v5e:1x1x1;n_slices=1;"
                             f"session_id={uuid.uuid4()};rank=4294967295")
r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "--pcm", "2"],
                   env=env, input=pcm_in.tobytes(), capture_output=True,
                   timeout=1200)
print(r.stderr[-1200:].decode(), flush=True)
assert r.returncode == 0, r.returncode
pcm_out = np.frombuffer(r.stdout, np.float32)
assert len(pcm_out) == n, (len(pcm_out), n)
err = np.abs(pcm_out - ref[:n]).max()
print(f"pcm mode vs python maxdiff = {err:.2e} over {n} samples")
assert err < 2e-4, err
print("NATIVE PCM MODE OK")
