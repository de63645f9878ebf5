"""Export a tiny CAUSAL codec-only artifact on TPU, run the native host in
codec mode (file + mono --pcm), compare against the live Python streaming
chain — the nn~ posture of the reference's AE exports (AE_causal forward,
/root/reference/after_scripts/export_autoencoder.py:225-247)."""
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _native_common import axon_env  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from after_tpu.cli.main import main as cli_main  # noqa: E402
from after_tpu.config import AutoEncoderConfig, ae_to_json  # noqa: E402
from after_tpu.dataset.audio import load_wav, save_wav  # noqa: E402
from after_tpu.models import AudioCodec  # noqa: E402
from after_tpu.utils.checkpoint import save_checkpoint  # noqa: E402

cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                        multipliers=(1, 2, 2), factors=(2, 2),
                        dilations=(1, 3), num_blocks_per_stage=1,
                        causal=True, use_norm=False)
codec = AudioCodec(cfg)
variables = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, cfg.ratio * 8, 1)))
run = "/tmp/nc_codec_run"
shutil.rmtree(run, ignore_errors=True)
save_checkpoint(run, 0, {"codec_vars": variables}, config_json=ae_to_json(cfg))
art = "/tmp/nc_codec_art"
shutil.rmtree(art, ignore_errors=True)
rc = cli_main(["export_autoencoder", "--model_path", run,
               "--chunk_size", "8", "--out", art])
assert rc == 0
print("exported", flush=True)

A = 8 * cfg.ratio
N_CHUNKS = 6
rng = np.random.RandomState(0)
x = (0.1 * rng.randn(N_CHUNKS * A)).astype(np.float32)
save_wav("/tmp/nc_in.wav", x, cfg.sr)
# read back so both hosts see the identical int16-quantized input
x, _ = load_wav("/tmp/nc_in.wav")

# Python host of the SAME artifact (the same compiled `forward` graph —
# a per-op encode/decode chain would differ at TPU default-matmul-precision
# rounding across the fusion boundary, which is not what this checks)
from after_tpu.streaming.export import ExportedCodec  # noqa: E402

host = ExportedCodec(art)
outs = []
for c in range(N_CHUNKS):
    xi = jnp.asarray(x[c * A:(c + 1) * A]).reshape(1, A, 1)
    outs.append(np.asarray(host.forward(xi)).ravel())
ref = np.concatenate(outs)
print("python host done", flush=True)

r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so",
                    "/tmp/nc_in.wav", "/tmp/nc_out.wav"],
                   env=axon_env(), capture_output=True, text=True,
                   timeout=1200)
print(r.stderr[-2000:], flush=True)
assert r.returncode == 0, r.returncode
out, _ = load_wav("/tmp/nc_out.wav")
n = min(len(out), len(ref))
err = np.abs(out[:n] - ref[:n]).max()
print(f"native codec vs python maxdiff = {err:.2e} over {n} samples")
assert err < 2e-4, err
print("NATIVE CODEC FILE MODE OK")

# mono live PCM mode: same quantized input over stdin, f32 frames out
r = subprocess.run(["/root/repo/native/stream_host", art,
                    "/opt/axon/libaxon_pjrt.so", "--pcm"],
                   env=axon_env(), input=x[:n].tobytes(),
                   capture_output=True, timeout=1200)
print(r.stderr[-1200:].decode(), flush=True)
assert r.returncode == 0, r.returncode
pcm_out = np.frombuffer(r.stdout, np.float32)
assert len(pcm_out) == n, (len(pcm_out), n)
err = np.abs(pcm_out - ref[:n]).max()
print(f"native codec pcm vs python maxdiff = {err:.2e}")
assert err < 2e-4, err
print("NATIVE CODEC PCM MODE OK")
