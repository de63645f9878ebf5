"""Export tiny donated streaming artifact on TPU, run native host, compare.

Covers the file-WAV mode and the --pcm live mode (stdin/stdout PCM)."""
import os, sys, subprocess
sys.path.insert(0, os.path.dirname(__file__))
from _native_common import axon_env, tiny_streaming_cfg

import jax, jax.numpy as jnp, numpy as np
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.streaming.export import export_streamer
from after_tpu.dataset.audio import save_wav, load_wav

cfg = tiny_streaming_cfg()
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

r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "/tmp/na_s.wav",
                    "/tmp/na_t.wav", "/tmp/na_out.wav"],
                   env=axon_env(), capture_output=True, text=True,
                   timeout=1200)
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
r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "--pcm", "2"],
                   env=axon_env(), input=pcm_in.tobytes(),
                   capture_output=True, timeout=1200)
print(r.stderr[-1200:].decode(), flush=True)
assert r.returncode == 0, r.returncode
pcm_out = np.frombuffer(r.stdout, np.float32)
assert len(pcm_out) == n, (len(pcm_out), n)
err = np.abs(pcm_out - ref[:n]).max()
print(f"pcm mode vs python maxdiff = {err:.2e} over {n} samples")
assert err < 2e-4, err
print("NATIVE PCM MODE OK")
