"""Train-step time decomposition at B=64 (VERDICT r2 #7).

Where do the non-matmul milliseconds go?  The axon relay forbids naive
device tracing from being trusted (it acks before execution), so this
measures COMPONENT graphs with the same honest chained+readback method the
benches use, each with XLA's own cost-analysis FLOPs:

  full        the shipped train_step (fwd + bwd + adam + EMA + BN writes)
  loss_grad   value_and_grad of the full loss only (no optimizer/EMA)
  fwd         loss forward only
  enc_fwd     ECAPA + Encoder1D conditioning forward only
  opt         optimizer update + EMA on frozen grads

full-loss_grad ~= optimizer+EMA overhead; loss_grad-fwd ~= backward;
enc share = enc_fwd/fwd.  Per-part TFLOP/s exposes which subgraph runs far
from the roofline.

Remote compiles are O(minutes) per new graph, so PARTS=... selects which
parts to measure in one invocation; results accumulate in
RESULTS_JSON (default /tmp/after_profile_parts.json) and the merged report
prints whenever `full` is present.  AFTER_PROFILE_TRACE=1 additionally
captures a jax.profiler trace of 5 full steps (host-side events are
trustworthy; device times through the relay are not).
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
    # rbg uses the TPU's hardware RNG path: much cheaper per element than
    # threefry for the dropout/noise masks the step generates
    jax.config.update("jax_default_prng_impl", os.environ["PRNG_IMPL"])
import optax

from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion.trainer import DiffusionTrainer

B = int(os.environ.get("B", "64"))
N = int(os.environ.get("N", "10"))
PARTS = os.environ.get("PARTS", "full,loss_grad,fwd,enc_fwd,opt").split(",")
RESULTS_JSON = os.environ.get("RESULTS_JSON",
                              f"/tmp/after_profile_parts_b{B}.json")
V5E_PEAK_F32 = 98.5e12


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
ARGS = (False, True, True, False, 0.05, 1.0)  # phase2, train encoders

LOSS_KW = dict(phase1=False, train_encoder=True, train_encoder_time=True,
               use_cycle=False, adversarial_weight=0.05,
               regularisation_weight=1.0)


@jax.jit
def loss_grad_fn(variables, batch, rng):
    main_params = trainer._main_params(variables)
    (loss, _), grads = jax.value_and_grad(
        trainer._compute_loss, has_aux=True)(
            main_params, variables, batch, rng, **LOSS_KW)
    # fold a grad-dependent scalar into the output so chaining consumes
    # the whole backward
    gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
    return loss + 0.0 * gsum


@jax.jit
def fwd_fn(variables, batch, rng):
    loss, _ = trainer._compute_loss(trainer._main_params(variables),
                                    variables, batch, rng, **LOSS_KW)
    return loss


@jax.jit
def enc_fwd_fn(variables, batch, rng):
    (cond, _, _), _ = trainer.rf.encode_timbre(variables, batch["x_cond"])
    (tcond, _, _), _ = trainer.rf.encode_structure(variables,
                                                   batch["x_time_cond"])
    return jnp.sum(cond) + jnp.sum(tcond)


@jax.jit
def opt_fn(opt_state, grads, main_params, ema):
    updates, opt_state = trainer.optimizer.update(grads, opt_state,
                                                  main_params)
    main_params = optax.apply_updates(main_params, updates)
    d = trainer.tc.ema_decay
    ema = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p, ema,
                                 main_params["net"])
    return opt_state, main_params, ema


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception as e:
        log(f"cost_analysis failed: {e!r}")
        return 0.0


results = {}
if os.path.exists(RESULTS_JSON):
    results = json.load(open(RESULTS_JSON))


def record(name, seconds, flops):
    results[name] = {"ms": round(seconds * 1e3, 3), "flops": flops}
    json.dump(results, open(RESULTS_JSON, "w"))
    log(f"{name}: {seconds*1e3:.2f} ms"
        + (f" ({flops/seconds/1e12:.1f} TFLOP/s)" if flops else ""))


main_params = trainer._main_params(state.variables)

if "full" in PARTS:
    # train_step donates its state argument, so chain on a COPY — the
    # component graphs still need the original buffers alive
    st = jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if hasattr(x, "shape") else x,
        (state.variables, state.opt_state, state.ema_params))
    fl = flops_of(type(trainer).train_step, trainer, st, batch,
                  jax.random.PRNGKey(1), *ARGS)
    st, m = trainer.train_step(st, batch, jax.random.PRNGKey(1), *ARGS)
    jax.block_until_ready(m)
    best = []
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            st, m = trainer.train_step(st, batch, jax.random.PRNGKey(i),
                                       *ARGS)
        assert np.isfinite(float(jax.device_get(m["diffusion_loss"])))
        best.append((time.perf_counter() - t0) / N)
    record("full", min(best), fl)
    if os.environ.get("AFTER_PROFILE_TRACE"):
        out_dir = os.environ.get("TRACE_DIR", "/tmp/after_trace")
        with jax.profiler.trace(out_dir):
            for i in range(5):
                st, m = trainer.train_step(st, batch,
                                           jax.random.PRNGKey(i), *ARGS)
            jax.block_until_ready(m)
        log(f"trace -> {out_dir}")

for name, fn in (("loss_grad", loss_grad_fn), ("fwd", fwd_fn),
                 ("enc_fwd", enc_fwd_fn)):
    if name not in PARTS:
        continue
    fl = flops_of(fn, state.variables, batch, jax.random.PRNGKey(1))
    out = fn(state.variables, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    best = []
    bb = dict(batch)
    for b in range(3):
        # chain by perturbing the batch with the previous output scalar
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(N):
            bb["x"] = batch["x"] + 1e-12 * s
            s = fn(state.variables, bb, jax.random.PRNGKey(i))
        assert np.isfinite(float(jax.device_get(s)))
        best.append((time.perf_counter() - t0) / N)
    record(name, min(best), fl)

if "opt" in PARTS:
    grads0 = jax.tree_util.tree_map(lambda x: x * 0 + 1e-6, main_params)
    fl = flops_of(opt_fn, state.opt_state, grads0, main_params,
                  main_params["net"])
    ot, pt, et = state.opt_state, main_params, main_params["net"]
    ot, pt, et = opt_fn(ot, grads0, pt, et)
    jax.block_until_ready(et)
    best = []
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            ot, pt, et = opt_fn(ot, grads0, pt, et)
        _ = float(jax.device_get(
            jax.tree_util.tree_leaves(et)[0].ravel()[0]))
        best.append((time.perf_counter() - t0) / N)
    record("opt", min(best), fl)

if "full" in results:
    t = {k: v["ms"] for k, v in results.items()}
    f = {k: v["flops"] for k, v in results.items()}
    report = {
        "metric": "train_step_decomposition", "batch": B,
        "parts_ms": t,
        "parts_tflops": {k: round(f[k] / (t[k] / 1e3) / 1e12, 2)
                         for k in t if f.get(k)},
        "mfu_vs_f32_peak": round(f["full"] / (t["full"] / 1e3)
                                 / V5E_PEAK_F32, 4) if f.get("full") else None,
    }
    if "loss_grad" in t and "fwd" in t:
        report["derived_ms"] = {
            "backward": round(t["loss_grad"] - t["fwd"], 2),
            "optimizer_ema_overhead": round(t["full"] - t["loss_grad"], 2),
            "encoder_share_of_fwd": round(t.get("enc_fwd", 0) / t["fwd"], 3),
        }
    print(json.dumps(report))
