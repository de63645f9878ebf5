"""Export a tiny batch_size=2 streaming artifact, stream two distinct
voices through the native host in one batched graph, compare each voice
against the live Python streamer running the same B=2 batch."""
import os, sys, subprocess
sys.path.insert(0, os.path.dirname(__file__))
from _native_common import axon_env, tiny_streaming_cfg

import jax, jax.numpy as jnp, numpy as np
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.streaming.export import export_streamer
from after_tpu.dataset.audio import save_wav, load_wav

B = 2
cfg = tiny_streaming_cfg()
pipe = TransferPipeline(cfg)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
streamer = Streamer(cfg, chunk_size=4)

art = "/tmp/native_batch_art"
import shutil; shutil.rmtree(art, ignore_errors=True)
export_streamer(streamer, variables, art, nb_steps=2, donate_state=True,
                batch_size=B)
print("exported batch_size=2", flush=True)

A = streamer.audio_chunk
N_CHUNKS = 6
rng = np.random.RandomState(0)
s_files, t_files, o_files = [], [], []
for v in range(B):
    save_wav(f"/tmp/nbv_s{v}.wav",
             (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32), cfg.sr)
    save_wav(f"/tmp/nbv_t{v}.wav",
             (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32), cfg.sr)
    s_files.append(f"/tmp/nbv_s{v}.wav")
    t_files.append(f"/tmp/nbv_t{v}.wav")
    o_files.append(f"/tmp/nbv_o{v}.wav")

s = np.stack([load_wav(f)[0] for f in s_files])  # (B, N)
t = np.stack([load_wav(f)[0] for f in t_files])
state = streamer.init_state(variables, B)
outs = []
for c in range(N_CHUNKS):
    sl = slice(c * A, (c + 1) * A)
    key = jax.random.wrap_key_data(jnp.asarray([c + 1, 42], jnp.uint32))
    zs, state = streamer.structure(variables, state,
                                   jnp.asarray(s[:, sl])[..., None])
    zt, state = streamer.timbre(variables, state,
                                jnp.asarray(t[:, sl])[..., None])
    z, state = streamer.diffuse(variables, state, zs, zt, 2, rng=key)
    y, state = streamer.decode(variables, state, z)
    outs.append(np.asarray(y)[..., 0])  # (B, A)
ref = np.concatenate(outs, axis=1)  # (B, N)
print("python host done", flush=True)

r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", ",".join(s_files),
                    ",".join(t_files), ",".join(o_files)],
                   env=axon_env(), capture_output=True, text=True,
                   timeout=1200)
print(r.stderr[-1500:], flush=True)
assert r.returncode == 0, r.returncode
for v in range(B):
    out, _ = load_wav(o_files[v])
    n = min(len(out), ref.shape[1])
    err = np.abs(out[:n] - ref[v, :n]).max()
    print(f"voice {v}: native vs python maxdiff = {err:.2e} over {n}")
    assert err < 2e-4, err
print("NATIVE BATCHED VOICES OK")
