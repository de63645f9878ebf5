"""steps_per_call A/B: diffusion train steps/s with K steps fused into one
XLA call (trainer.multi_step lax.scan) vs the classic per-step dispatch.

The sandbox relay adds a ~16 ms host round trip per chained call
(PARITY.md); one dispatch per K steps should amortize it — this measures
how much of the per-step wall clock was dispatch vs device compute.

Honest method: the state chain threads every call (donated inputs differ
call-to-call, so the relay cannot dedup) and each timing block ends with a
host readback of a loss that depends on the whole chain.

Env: B (64), KS (1,4,8), N (32 steps per timing block), COMPUTE_DTYPE,
PRNG_IMPL (rbg mirrors the recorded best), RESULTS_JSON.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
if os.environ.get("PRNG_IMPL"):
    jax.config.update("jax_default_prng_impl", os.environ["PRNG_IMPL"])

from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion.trainer import DiffusionTrainer

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "32"))
KS = [int(k) for k in os.environ.get("KS", "1,4,8").split(",")]
RESULTS_JSON = os.environ.get("RESULTS_JSON",
                              f"/tmp/after_multistep_b{B}.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


cfg = get_config("base").resolved(in_size=64, n_signal=128)
cfg = with_overrides(cfg, {"train.batch_size": B})
if os.environ.get("COMPUTE_DTYPE"):
    cfg = with_overrides(cfg, {"train.compute_dtype":
                               os.environ["COMPUTE_DTYPE"]})
trainer = DiffusionTrainer(cfg)
log(f"init B={B}...")
state = trainer.init(jax.random.PRNGKey(0), B)
rng0 = np.random.RandomState(0)
batch = {k: jnp.asarray(rng0.randn(B, 128, 64).astype(np.float32))
         for k in ("x", "x_cond", "x_time_cond")}
STATICS = (False, True, True, False)          # phase2, train encoders, no cycle
ADV_W, REG_W = 0.05, 1.0

results = {}
if os.path.exists(RESULTS_JSON):
    results = json.load(open(RESULTS_JSON))

base_key = jax.random.PRNGKey(42)

for K in KS:
    if K == 1:
        st = (state.variables, state.opt_state, state.ema_params)
        st = jax.tree_util.tree_map(jnp.copy, st)
        rngs = jax.block_until_ready(
            [jax.random.fold_in(base_key, i) for i in range(N + 1)])

        def run(st, i):
            return trainer.train_step(st, batch, rngs[i % (N + 1)], *STATICS,
                                      ADV_W, REG_W)
    else:
        st = (state.variables, state.opt_state, state.cls_opt_state,
              state.ema_params)
        st = jax.tree_util.tree_map(jnp.copy, st)
        stacked = {k: jnp.broadcast_to(v, (K,) + v.shape).copy()
                   for k, v in batch.items()}
        is_cls = jnp.zeros((K,), bool)
        adv = jnp.full((K,), ADV_W, jnp.float32)
        reg = jnp.full((K,), REG_W, jnp.float32)
        rngs = jax.block_until_ready(
            [jax.random.split(jax.random.fold_in(base_key, i), K)
             for i in range(N + 1)])

        def run(st, i):
            return trainer.multi_step(st, stacked,
                                      (rngs[i % (N + 1)], is_cls, adv, reg),
                                      *STATICS)

    t0 = time.perf_counter()
    st, m = run(st, 0)
    jax.block_until_ready(m["loss"])
    log(f"K={K}: compile+first {time.perf_counter()-t0:.1f}s")

    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(1, N // K + 1):
            st, m = run(st, i)
        assert np.isfinite(float(jax.device_get(m["loss"])))
        best.append((time.perf_counter() - t0) / ((N // K) * K))
    ms = min(best) * 1e3
    results[f"k{K}"] = {"ms_per_step": round(ms, 3),
                        "steps_per_sec": round(1e3 / ms, 1)}
    json.dump(results, open(RESULTS_JSON, "w"))
    log(f"K={K}: {ms:.2f} ms/step ({1e3/ms:.1f} steps/s)")
    del st

ref = results.get("k1", {}).get("ms_per_step")
print(json.dumps({"metric": "multistep_train_ab", "batch": B,
                  "compute_dtype": os.environ.get("COMPUTE_DTYPE", "f32"),
                  "prng_impl": os.environ.get("PRNG_IMPL", "default"),
                  **{k: v["ms_per_step"] for k, v in results.items()},
                  **({"speedup_k" + k[1:]: round(ref / v["ms_per_step"], 2)
                      for k, v in results.items() if k != "k1"}
                     if ref else {})}))
