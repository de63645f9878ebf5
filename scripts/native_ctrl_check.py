"""Verify the native host's live attribute control path: a run whose
AFTER_NATIVE_CTRL file sets nb_steps=4 (CLI says 1) must produce exactly
the output of a run with CLI nb_steps=4, and differ from CLI nb_steps=1."""
import os, sys, subprocess
sys.path.insert(0, os.path.dirname(__file__))
from _native_common import axon_env, tiny_streaming_cfg

import jax, numpy as np
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.streaming.export import export_streamer
from after_tpu.dataset.audio import save_wav, load_wav

cfg = tiny_streaming_cfg()
pipe = TransferPipeline(cfg)
variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
streamer = Streamer(cfg, chunk_size=4)

art = "/tmp/native_ctrl_art"
import shutil; shutil.rmtree(art, ignore_errors=True)
export_streamer(streamer, variables, art, nb_steps=1, donate_state=True)
print("exported", flush=True)

A = streamer.audio_chunk
N = 6
rng = np.random.RandomState(0)
save_wav("/tmp/nc_s.wav", (0.1 * rng.randn(N * A)).astype(np.float32), cfg.sr)
save_wav("/tmp/nc_t.wav", (0.1 * rng.randn(N * A)).astype(np.float32), cfg.sr)


def run(out, nb_steps_cli, ctrl_lines=None):
    env = axon_env()
    if ctrl_lines is not None:
        with open("/tmp/nc_ctrl.txt", "w") as f:
            f.write(ctrl_lines)
        env["AFTER_NATIVE_CTRL"] = "/tmp/nc_ctrl.txt"
    r = subprocess.run(["/root/repo/native/stream_host", art,
                        "/opt/axon/libaxon_pjrt.so", "/tmp/nc_s.wav",
                        "/tmp/nc_t.wav", out, str(N), str(nb_steps_cli)],
                       env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    return load_wav(out)[0]


a = run("/tmp/nc_a.wav", 1)
b = run("/tmp/nc_b.wav", 4)
c = run("/tmp/nc_c.wav", 1, ctrl_lines="nb_steps 4\n")
assert not np.array_equal(a, b), "nb_steps must change the output"
assert np.array_equal(b, c), (
    f"ctrl-set nb_steps must equal CLI nb_steps; maxdiff "
    f"{np.abs(b - c).max():.2e}")
print("ctrl nb_steps == CLI nb_steps (exact); 1-step != 4-step: OK")
print("NATIVE CTRL ATTRS OK")
