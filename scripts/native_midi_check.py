"""Export a tiny MIDI-config streaming artifact on TPU, run the native
host in MIDI mode (notes.bin + timbre WAV), compare against the live
Python streamer driven with the same state order (timbre -> diffuse_midi
-> decode) and per-chunk rng convention."""
import os, sys, subprocess
sys.path.insert(0, os.path.dirname(__file__))
from _native_common import axon_env, tiny_streaming_cfg

import dataclasses
import jax, jax.numpy as jnp, numpy as np
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.streaming.export import export_streamer
from after_tpu.dataset.audio import save_wav, load_wav

cfg = tiny_streaming_cfg(
    extra={"zs_channels": 128, "denoiser.tcond_dim": 128,
           "structure_type": "midi"},
    drop=("encoder_time.channels",))
cfg = dataclasses.replace(cfg, encoder_time=None, classifier=None)
pipe = TransferPipeline(cfg)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
streamer = Streamer(cfg, chunk_size=4)

art = "/tmp/native_midi_art"
import shutil; shutil.rmtree(art, ignore_errors=True)
export_streamer(streamer, variables, art, nb_steps=2, donate_state=True)
print("exported", flush=True)

A = streamer.audio_chunk
CS = 4
N_CHUNKS = 6
rng = np.random.RandomState(0)
t = (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32)
save_wav("/tmp/nm_t.wav", t, cfg.sr)

# deterministic held-note pattern across buffers
notes = np.zeros((N_CHUNKS * CS, streamer.n_poly, 2), np.float32)
notes[:, 0] = (60, 100)
notes[2 * CS:, 1] = (67, 90)
notes.tofile("/tmp/nm_notes.bin")

t, _ = load_wav("/tmp/nm_t.wav")
state = streamer.init_state(variables)
outs = []
for c in range(N_CHUNKS):
    key = jax.random.wrap_key_data(jnp.asarray([c + 1, 42], jnp.uint32))
    zt, state = streamer.timbre(variables, state,
                                jnp.asarray(t[c * A:(c + 1) * A])
                                .reshape(1, A, 1))
    z, state = streamer.diffuse_midi(
        variables, state,
        jnp.asarray(notes[c * CS:(c + 1) * CS])[None], zt, 2, rng=key)
    y, state = streamer.decode(variables, state, z)
    outs.append(np.asarray(y).ravel())
ref = np.concatenate(outs)
print("python host done", flush=True)

r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "/tmp/nm_notes.bin",
                    "/tmp/nm_t.wav", "/tmp/nm_out.wav"],
                   env=axon_env(), capture_output=True, text=True,
                   timeout=1200)
print(r.stderr[-1500:], flush=True)
assert r.returncode == 0, r.returncode
out, _ = load_wav("/tmp/nm_out.wav")
n = min(len(out), len(ref))
err = np.abs(out[:n] - ref[:n]).max()
print(f"native midi vs python maxdiff = {err:.2e} over {n} samples")
assert err < 2e-4, err
print("NATIVE MIDI MODE OK")
