"""Training throughput: base-config diffusion train step (batch 32, n_signal
128, full DenoiserV2 + ECAPA + Encoder1D + adversarial term) on one chip."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from after_tpu.config import get_config
from after_tpu.diffusion.trainer import DiffusionTrainer

def log(m): print(m, file=sys.stderr, flush=True)
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
print(json.dumps({"metric": "diffusion_train_step", "value": round(dt*1000, 1),
                  "unit": f"ms/step (batch {B}, seq 128, base config)",
                  "steps_per_sec": round(1/dt, 2)}))
