"""TPU training soak: base config, full curriculum (phase1 -> phase2 with
adversarial classifier + cycle), 3000 steps, NaN watch."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import os
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np
from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion.trainer import DiffusionTrainer

cfg = get_config("base", "cycle")
cfg = with_overrides(cfg, {
    "train.timbre_warmup": 1000,
    "train.cycle_start_step": 1500,
    "train.adversarial_warmup": 500,
    "train.batch_size": 16,
    "train.n_signal": 128,
}).resolved(in_size=64, n_signal=128)
tr = DiffusionTrainer(cfg)
t0 = time.perf_counter()
state = tr.init(jax.random.PRNGKey(0), 16)
print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

rng = np.random.RandomState(0)
def batches():
    while True:
        z = np.cumsum(0.25 * rng.randn(16, 128, 64), axis=1).astype(np.float32)
        z -= z.mean(axis=1, keepdims=True)
        z /= (z.std() + 1e-5)
        yield {"x": z, "x_cond": z, "x_time_cond": z}

log = {"loss": [], "adv": [], "cyc": [], "skipped": 0}
def cb(state, m):
    if "diffusion_loss" in m:
        log["loss"].append(m["diffusion_loss"])
        log["adv"].append(m.get("adversarial_loss", 0.0))
        log["cyc"].append(m.get("cycle_cond", 0.0))
        if "skipped_nonfinite" in m:
            log["skipped"] = m["skipped_nonfinite"]

t0 = time.perf_counter()
state = tr.fit(state, batches(), max_steps=3000, callback=cb)
dt = time.perf_counter() - t0
ls = np.asarray([float(x) for x in log["loss"]])
adv = np.asarray([float(x) for x in log["adv"]])
cyc = np.asarray([float(x) for x in log["cyc"]])
n = len(ls)
print(f"steps={n} wall={dt:.0f}s ({3000/dt:.1f} steps/s sustained)")
print(f"loss first100={ls[:100].mean():.3f} mid={ls[n//2:n//2+100].mean():.3f} "
      f"last100={ls[-100:].mean():.3f}")
print(f"nan_losses={int(np.sum(~np.isfinite(ls)))} "
      f"skipped_nonfinite={int(log['skipped'])}")
print(f"adversarial active: {float(np.abs(adv[-100:]).mean()):.4f}  "
      f"cycle active: {float(np.abs(cyc[-100:]).mean()):.4f}")
assert np.isfinite(ls).all()
assert ls[-100:].mean() < ls[:100].mean()
print("TPU SOAK OK")
