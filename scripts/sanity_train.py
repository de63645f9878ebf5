"""Training sanity: micro diffusion model on structured synthetic latents —
verify the loss decreases substantially over a few hundred steps."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from after_tpu.config import with_overrides
from after_tpu.diffusion.trainer import DiffusionTrainer
from test_diffusion import micro_config

cfg = micro_config()
cfg = with_overrides(cfg, {"train.timbre_warmup": 40, "train.batch_size": 8,
                           "train.steps_display": 50})
# optional: `python scripts/sanity_train.py edm` drives the EDM formulation
if len(sys.argv) > 1:
    cfg = with_overrides(cfg, {"diffusion_type": sys.argv[1]})
    print(f"diffusion_type = {cfg.diffusion_type}")
tr = DiffusionTrainer(cfg)
state = tr.init(jax.random.PRNGKey(0), 8)

rng = np.random.RandomState(0)
def batches(n):
    for i in range(n):
        # structured latents: smooth random walks (learnable distribution)
        z = np.cumsum(0.3 * rng.randn(8, 32, 8), axis=1).astype(np.float32)
        z -= z.mean(axis=1, keepdims=True)
        yield {"x": z, "x_cond": z, "x_time_cond": z}

losses = []
state = tr.fit(state, batches(400), max_steps=400,
               callback=lambda s, m: losses.append(m.get("diffusion_loss")))
ls = [l for l in losses if l is not None]
first = np.mean(ls[:30]); last = np.mean(ls[-30:])
print(f"diffusion loss: first30={first:.4f} last30={last:.4f}")
assert last < first * 0.8, "loss did not decrease"
print("TRAINING SANITY OK")
