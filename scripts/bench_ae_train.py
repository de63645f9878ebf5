"""Codec GAN training throughput: generator + discriminator steps at the
baseAE config (batch 8, num_signal 131072, 16-band PQMF, Encodec
discriminator) on one chip — the reference's 1M-step codec schedule
(baseAE.gin:26-28).

Honest chained+readback method (CLAUDE.md): steps chain through the train
state and every timing block ends with a host readback of a metric that
depends on the whole chain.

B=..., N=..., NUM_SIGNAL=... env knobs; GAN=0 benches the warmup
(generator-only) phase.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

if os.environ.get("SUBPIXEL_UP") == "0":
    # A/B knob: fall back to lax.conv_transpose upsamplers
    from after_tpu.ops.conv import use_matmul_upsample
    use_matmul_upsample(False)

from after_tpu.autoencoder import AutoencoderTrainer
from after_tpu.config import AETrainConfig, get_ae_config

B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "5"))
NUM_SIGNAL = int(os.environ.get("NUM_SIGNAL", "131072"))
USE_GAN = os.environ.get("GAN", "1") != "0"
V5E_PEAK_F32 = 98.5e12


def log(m):
    print(m, file=sys.stderr, flush=True)


ae_cfg = get_ae_config()
tc = AETrainConfig(batch_size=B, num_signal=NUM_SIGNAL,
                   compute_dtype=os.environ.get("COMPUTE_DTYPE") or None)
trainer = AutoencoderTrainer(ae_cfg, tc)
log(f"init B={B} num_signal={NUM_SIGNAL}...")
t0 = time.perf_counter()
state = trainer.init(jax.random.PRNGKey(0), B)
log(f"init {time.perf_counter()-t0:.0f}s")

rng = np.random.RandomState(0)
x = jnp.asarray(0.1 * rng.randn(B, NUM_SIGNAL, 1).astype(np.float32))


def flops_of(bound, *args, **kw):
    try:
        ca = bound.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception as e:
        log(f"cost_analysis failed: {e!r}")
        return 0.0


out = {"metric": "ae_train_step", "batch": B, "num_signal": NUM_SIGNAL,
       "compute_dtype": os.environ.get("COMPUTE_DTYPE", "f32")}

# generator step (post-warmup form: GAN terms on)
gt = (state.codec_vars, state.disc_vars, state.opt_state)
fl_gen = flops_of(type(trainer).gen_step, trainer, gt, x,
                  jax.random.PRNGKey(1), USE_GAN, 1.0, 0.1)
log("compile gen...")
t0 = time.perf_counter()
gt, m = trainer.gen_step(gt, x, jax.random.PRNGKey(1), USE_GAN, 1.0, 0.1)
jax.block_until_ready(m["total_loss"])
log(f"gen compile+first {time.perf_counter()-t0:.0f}s")
best = []
for b in range(3):
    t0 = time.perf_counter()
    for i in range(N):
        gt, m = trainer.gen_step(gt, x, jax.random.PRNGKey(i), USE_GAN,
                                 1.0, 0.1)
    assert np.isfinite(float(jax.device_get(m["total_loss"])))
    best.append((time.perf_counter() - t0) / N)
dt_gen = min(best)
out["gen_ms_per_step"] = round(dt_gen * 1e3, 2)
if fl_gen:
    out["gen_tflops_per_sec"] = round(fl_gen / dt_gen / 1e12, 2)
    out["gen_mfu_vs_f32_peak"] = round(fl_gen / dt_gen / V5E_PEAK_F32, 4)
log(f"gen: {dt_gen*1e3:.1f} ms")

if USE_GAN:
    # discriminator step
    dt_state = (gt[0], gt[1], state.disc_opt_state)
    fl_disc = flops_of(type(trainer).disc_step, trainer, dt_state, x,
                       jax.random.PRNGKey(1))
    log("compile disc...")
    t0 = time.perf_counter()
    dt_state, md = trainer.disc_step(dt_state, x, jax.random.PRNGKey(1))
    jax.block_until_ready(md["loss_dis"] if "loss_dis" in md
                          else list(md.values())[0])
    log(f"disc compile+first {time.perf_counter()-t0:.0f}s")
    best = []
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            dt_state, md = trainer.disc_step(dt_state, x,
                                             jax.random.PRNGKey(i))
        assert np.isfinite(float(jax.device_get(
            list(md.values())[0])))
        best.append((time.perf_counter() - t0) / N)
    dt_disc = min(best)
    out["disc_ms_per_step"] = round(dt_disc * 1e3, 2)
    if fl_disc:
        out["disc_tflops_per_sec"] = round(fl_disc / dt_disc / 1e12, 2)
    log(f"disc: {dt_disc*1e3:.1f} ms")
    # production cadence: 1 disc step per 4 steps (baseAE cadence)
    avg = 0.75 * dt_gen + 0.25 * dt_disc
    out["avg_ms_per_step_cadence_1in4"] = round(avg * 1e3, 2)
    out["steps_per_sec"] = round(1 / avg, 2)
    out["samples_per_sec"] = round(B / avg, 1)
    out["audio_seconds_per_sec"] = round(B * NUM_SIGNAL / 44100 / avg, 1)
    out["hours_for_1M_steps"] = round(1e6 * avg / 3600, 1)

print(json.dumps(out))
