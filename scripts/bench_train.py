"""Training throughput: base-config diffusion train step (batch 32, n_signal
128, full DenoiserV2 + ECAPA + Encoder1D + adversarial term) on one chip.

Reports ms/step plus model-FLOPs utilisation: FLOPs come from XLA's own
cost analysis of the compiled step (no hand-counted estimates), divided by
wall time and the chip's peak.  v5e peak: 197 TFLOP/s bf16 / 98.5 TFLOP/s
fp32 MXU (fp32 runs at half bf16 rate through the MXU passes).

Measures f32 and bf16 (train.compute_dtype) INTERLEAVED in one process —
per-process numbers drift between sandbox sessions (CLAUDE.md), so only
same-process A/B deltas are meaningful.  AFTER_BENCH_DTYPES=f32 (or
bfloat16) restricts the run.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from after_tpu.config import get_config, with_overrides
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

which = [("f32" if n in ("f32", "float32") else n) for n in
         os.environ.get("AFTER_BENCH_DTYPES", "f32,bfloat16").split(",")]
base_cfg = get_config("base").resolved(in_size=64, n_signal=128)
B, T, C = base_cfg.train.batch_size, 128, 64
rng = np.random.RandomState(0)
batch = {k: jnp.asarray(rng.randn(B, T, C).astype(np.float32))
         for k in ("x", "x_cond", "x_time_cond")}

runs = {}
for name in which:
    cd = None if name in ("f32", "float32") else name
    cfg = with_overrides(base_cfg, {"train.compute_dtype": cd})
    trainer = DiffusionTrainer(cfg)
    log(f"[{name}] init (batch {B})...")
    t0 = time.perf_counter()
    state = trainer.init(jax.random.PRNGKey(0), B)
    log(f"[{name}] init {time.perf_counter()-t0:.0f}s")
    st = (state.variables, state.opt_state, state.ema_params)
    flops = step_flops(trainer, st, batch, jax.random.PRNGKey(1))
    log(f"[{name}] train-step FLOPs (XLA cost analysis): {flops/1e9:.1f} GFLOP")
    t0 = time.perf_counter()
    st, m = trainer.train_step(st, batch, jax.random.PRNGKey(1),
                               False, True, True, False, 0.05, 1.0)
    jax.block_until_ready(m)
    log(f"[{name}] compile+first {time.perf_counter()-t0:.0f}s")
    runs[name] = (trainer, st, flops)

# interleaved timing: alternate dtypes block by block, best block wins.
# Steps CHAIN through the train state (step k+1 consumes step k's output),
# and each block ends with a HOST READBACK of a metric scalar — the axon
# relay acks block_until_ready before execution completes (CLAUDE.md), so
# only a readback of a value that depends on the whole chain gives honest
# wall time.
N, BLOCKS = 10, 4
times = {name: [] for name in runs}
for b in range(BLOCKS):
    for name, (trainer, st, _) in runs.items():
        t0 = time.perf_counter()
        for i in range(N):
            st, m = trainer.train_step(st, batch, jax.random.PRNGKey(i),
                                       False, True, True, False, 0.05, 1.0)
        assert np.isfinite(float(jax.device_get(m["loss"])))
        times[name].append((time.perf_counter() - t0) / N)
        runs[name] = (trainer, st, runs[name][2])

out = {}
for name, ts in times.items():
    dt = min(ts)
    flops = runs[name][2]
    log(f"[{name}] per-block ms {[round(t*1e3, 2) for t in ts]}")
    out[name] = {
        "ms_per_step": round(dt * 1000, 2),
        "steps_per_sec": round(1 / dt, 2),
        "model_tflops_per_sec": round(flops / dt / 1e12, 2) if flops else 0,
        "mfu_vs_f32_peak": round(flops / dt / V5E_PEAK_F32, 4)
        if flops else None,
        "mfu_vs_bf16_peak": round(flops / dt / V5E_PEAK_BF16, 4)
        if flops else None,
    }

# headline = f32, the shipped default (bf16 measured slower)
main_name = "f32" if "f32" in out else next(iter(out))
rec = {"metric": "diffusion_train_step",
       "value": out[main_name]["ms_per_step"],
       "unit": f"ms/step (batch {B}, seq 128, base config, {main_name})",
       **out[main_name]}
for name, stats in out.items():
    if name != main_name:
        rec[name] = stats
if "f32" in out and "bfloat16" in out:
    rec["speedup_bf16_vs_f32"] = round(
        out["f32"]["ms_per_step"] / out["bfloat16"]["ms_per_step"], 3)
print(json.dumps(rec))
