"""A/B the MR-STFT loss: jnp.fft.rfft vs the MXU windowed-DFT matmul path
(ops/stft.py `use_matmul_dft`), interleaved in one process on the real chip
with the honest chained+readback method.

Measures the loss forward and its value_and_grad (the part the codec
generator step actually pays), then the full gen_step with the new default.

Env knobs: B (8), NUM_SIGNAL (131072), N (5 inner iters).
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from after_tpu.autoencoder.losses import multi_resolution_stft_loss
from after_tpu.config import AETrainConfig, get_ae_config
from after_tpu.ops import stft as stft_ops

B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "5"))
NUM_SIGNAL = int(os.environ.get("NUM_SIGNAL", "131072"))


def log(m):
    print(m, file=sys.stderr, flush=True)


ae_cfg = get_ae_config()
tc = AETrainConfig(batch_size=B, num_signal=NUM_SIGNAL,
                   stft_bf16_dft=os.environ.get("BF16_DFT", "0") != "0")
rng = np.random.RandomState(0)
x = jnp.asarray(0.1 * rng.randn(B, NUM_SIGNAL, 1).astype(np.float32))
y = jnp.asarray(0.1 * rng.randn(B, NUM_SIGNAL, 1).astype(np.float32))


def make_fns():
    # (re)trace under the current matmul-DFT setting
    @jax.jit
    def fwd(x, y):
        return multi_resolution_stft_loss(x, y, tc, ae_cfg.sr)

    @jax.jit
    def vgrad(x, y):
        return jax.value_and_grad(
            lambda y: multi_resolution_stft_loss(x, y, tc, ae_cfg.sr))(y)

    return fwd, vgrad


def time_chained(fn, *args, reduce=lambda r: r):
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(3):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(N):
            out = fn(args[0] + 1e-12 * acc, *args[1:])
            acc = reduce(out)
        assert np.isfinite(float(jax.device_get(acc)))
        best.append((time.perf_counter() - t0) / N)
    return min(best) * 1e3


results = {}
vals = {}
for name, enable in [("fft", False), ("matmul", True), ("fft2", False),
                     ("matmul2", True)]:
    stft_ops.use_matmul_dft(enable)
    fwd, vgrad = make_fns()
    results[f"fwd_{name}"] = time_chained(fwd, x, y)
    results[f"grad_{name}"] = time_chained(
        vgrad, x, y, reduce=lambda r: r[0] + 1e-30 * jnp.sum(r[1]))
    vals[name] = float(jax.device_get(fwd(x, y)))
    log(f"{name}: fwd {results[f'fwd_{name}']:.2f} ms, "
        f"grad {results[f'grad_{name}']:.2f} ms, loss {vals[name]:.6f}")
stft_ops.use_matmul_dft(True)

fwd_fft = min(results["fwd_fft"], results["fwd_fft2"])
fwd_mm = min(results["fwd_matmul"], results["fwd_matmul2"])
grad_fft = min(results["grad_fft"], results["grad_fft2"])
grad_mm = min(results["grad_matmul"], results["grad_matmul2"])
print(json.dumps({
    "metric": "mrstft_ab", "batch": B, "num_signal": NUM_SIGNAL,
    "fwd_fft_ms": round(fwd_fft, 2), "fwd_matmul_ms": round(fwd_mm, 2),
    "grad_fft_ms": round(grad_fft, 2), "grad_matmul_ms": round(grad_mm, 2),
    "fwd_speedup": round(fwd_fft / fwd_mm, 2),
    "grad_speedup": round(grad_fft / grad_mm, 2),
    "loss_rel_diff": abs(vals["matmul"] - vals["fft"]) / abs(vals["fft"]),
}))
