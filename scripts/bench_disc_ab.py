"""A/B: disc_step with split vs batched [x ‖ y] discriminator chains,
interleaved in ONE process (kills session variance). Honest chained+readback
timing per CLAUDE.md."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from after_tpu.autoencoder import AutoencoderTrainer
from after_tpu.config import AETrainConfig, get_ae_config

B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "5"))
NUM_SIGNAL = int(os.environ.get("NUM_SIGNAL", "131072"))

ae_cfg = get_ae_config()
trainers = {
    "split": AutoencoderTrainer(ae_cfg, AETrainConfig(
        batch_size=B, num_signal=NUM_SIGNAL, disc_batched=False)),
    "batched": AutoencoderTrainer(ae_cfg, AETrainConfig(
        batch_size=B, num_signal=NUM_SIGNAL, disc_batched=True)),
}
print("init...", file=sys.stderr, flush=True)
state = trainers["split"].init(jax.random.PRNGKey(0), B)
rng = np.random.RandomState(0)
x = jnp.asarray(0.1 * rng.randn(B, NUM_SIGNAL, 1).astype(np.float32))

res = {}
for name, tr in trainers.items():
    st = (jax.tree_util.tree_map(jnp.copy, state.codec_vars),
          jax.tree_util.tree_map(jnp.copy, state.disc_vars),
          jax.tree_util.tree_map(
              lambda a: jnp.copy(a) if hasattr(a, "shape") else a,
              state.disc_opt_state))
    t0 = time.perf_counter()
    st, m = tr.disc_step(st, x, jax.random.PRNGKey(1))
    jax.block_until_ready(list(m.values())[0])
    print(f"{name}: compile+first {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    best = []
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            st, m = tr.disc_step(st, x, jax.random.PRNGKey(i))
        assert np.isfinite(float(jax.device_get(list(m.values())[0])))
        best.append((time.perf_counter() - t0) / N)
    res[name] = round(min(best) * 1e3, 2)
    print(f"{name}: {res[name]} ms", file=sys.stderr, flush=True)

print(json.dumps({"metric": "disc_step_ab", "batch": B,
                  "num_signal": NUM_SIGNAL, "split_ms": res["split"],
                  "batched_ms": res["batched"],
                  "speedup": round(res["split"] / res["batched"], 3)}))
