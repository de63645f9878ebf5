"""Training throughput: base-config diffusion train step (batch 32, n_signal
128, full DenoiserV2 + ECAPA + Encoder1D + adversarial term) on one chip.

Reports ms/step plus model-FLOPs utilisation: FLOPs come from XLA's own
cost analysis of the compiled step (no hand-counted estimates), divided by
wall time and the chip's peak.  v5e peak: 197 TFLOP/s bf16 / 98.5 TFLOP/s
fp32 MXU (fp32 runs at half bf16 rate through the MXU passes)."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from after_tpu.config import get_config
from after_tpu.diffusion.trainer import DiffusionTrainer

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12

def log(m): print(m, file=sys.stderr, flush=True)

def step_flops(trainer, st, batch, key):
    """FLOPs of one compiled train step per XLA cost analysis."""
    try:
        # .lower on the jitted unbound function: self is static argnum 0
        lowered = type(trainer).train_step.lower(
            trainer, st, batch, key, False, True, True, False, 0.05, 1.0)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception as e:
        log(f"cost_analysis unavailable: {e!r}")
        return 0.0

cfg = get_config("base").resolved(in_size=64, n_signal=128)
trainer = DiffusionTrainer(cfg)
B, T, C = cfg.train.batch_size, 128, 64
log(f"init (batch {B})...")
t0 = time.perf_counter()
state = trainer.init(jax.random.PRNGKey(0), B)
log(f"init {time.perf_counter()-t0:.0f}s")
rng = np.random.RandomState(0)
batch = {k: jnp.asarray(rng.randn(B, T, C).astype(np.float32))
         for k in ("x", "x_cond", "x_time_cond")}
st = (state.variables, state.opt_state, state.ema_params)
flops = step_flops(trainer, st, batch, jax.random.PRNGKey(1))
log(f"train-step FLOPs (XLA cost analysis): {flops/1e9:.1f} GFLOP")
log("compile phase-2 train step...")
t0 = time.perf_counter()
st, m = trainer.train_step(st, batch, jax.random.PRNGKey(1),
                           False, True, True, False, 0.05, 1.0)
jax.block_until_ready(m)
log(f"compile+first {time.perf_counter()-t0:.0f}s")
N = 20
t0 = time.perf_counter()
for i in range(N):
    st, m = trainer.train_step(st, batch, jax.random.PRNGKey(i),
                               False, True, True, False, 0.05, 1.0)
jax.block_until_ready(m)
dt = (time.perf_counter() - t0) / N
tflops = flops / dt / 1e12 if flops else 0.0
print(json.dumps({"metric": "diffusion_train_step", "value": round(dt*1000, 1),
                  "unit": f"ms/step (batch {B}, seq 128, base config)",
                  "steps_per_sec": round(1/dt, 2),
                  "model_tflops_per_sec": round(tflops, 2),
                  "mfu": round(flops / dt / V5E_PEAK_F32, 4) if flops else None,
                  "mfu_vs_bf16_peak": round(flops / dt / V5E_PEAK_BF16, 4)
                  if flops else None}))
