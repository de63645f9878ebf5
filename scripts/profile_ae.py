"""Codec generator-step decomposition (PARITY.md flags its 15% MFU as the
next codec perf lever): where do the 335 ms at batch 8 x 131072 go?

Components measured with the honest chained+readback method:

  full       gen_step (codec fwd + MR-STFT + disc-gen term + backward + adam)
  codec_fwd  AudioCodec forward only
  mrstft     MR-STFT loss only (7 FFT scales + A-weighting prefilter)
  disc_fwd   EncodecDiscriminator generator-loss forward only

PARTS=... / B=... / NUM_SIGNAL=... env knobs; results accumulate in
RESULTS_JSON like profile_train.py.
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
from after_tpu.autoencoder.losses import multi_resolution_stft_loss
from after_tpu.config import AETrainConfig, get_ae_config

B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "5"))
NUM_SIGNAL = int(os.environ.get("NUM_SIGNAL", "131072"))
PARTS = os.environ.get("PARTS", "full,codec_fwd,mrstft,disc_fwd").split(",")
RESULTS_JSON = os.environ.get("RESULTS_JSON",
                              f"/tmp/after_profile_ae_b{B}.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


ae_cfg = get_ae_config()
tc = AETrainConfig(batch_size=B, num_signal=NUM_SIGNAL)
trainer = AutoencoderTrainer(ae_cfg, tc)
log(f"init B={B}...")
state = trainer.init(jax.random.PRNGKey(0), B)
rng = np.random.RandomState(0)
x = jnp.asarray(0.1 * rng.randn(B, NUM_SIGNAL, 1).astype(np.float32))


@jax.jit
def codec_fwd_fn(codec_vars, x, rng):
    y, yb, z, regloss, xb = trainer.codec.apply(
        codec_vars, x, rng=rng, rngs={"noise": jax.random.fold_in(rng, 1)})
    return jnp.sum(y) + regloss


@jax.jit
def mrstft_fn(x, y):
    n = min(x.shape[1], y.shape[1])
    return multi_resolution_stft_loss(x[:, :n], y[:, :n], trainer.tc,
                                      trainer.cfg.sr)


@jax.jit
def disc_fwd_fn(disc_vars, x, y):
    n = min(x.shape[1], y.shape[1])
    loss_gen, _, _ = trainer.disc.apply(disc_vars, x[:, :n], y[:, :n])
    return loss_gen


def flops_of(jitted, *args, **kw):
    try:
        ca = jitted.lower(*args, **kw).compile().cost_analysis()
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


if "full" in PARTS:
    gt = jax.tree_util.tree_map(
        lambda a: jnp.copy(a) if hasattr(a, "shape") else a,
        (state.codec_vars, state.disc_vars, state.opt_state))
    fl = flops_of(type(trainer).gen_step, trainer, gt, x,
                  jax.random.PRNGKey(1), True, 1.0, 0.1)
    gt, m = trainer.gen_step(gt, x, jax.random.PRNGKey(1), True, 1.0, 0.1)
    jax.block_until_ready(m["total_loss"])
    best = []
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            gt, m = trainer.gen_step(gt, x, jax.random.PRNGKey(i), True,
                                     1.0, 0.1)
        assert np.isfinite(float(jax.device_get(m["total_loss"])))
        best.append((time.perf_counter() - t0) / N)
    record("full", min(best), fl)

y0 = None
if {"codec_fwd", "mrstft", "disc_fwd"} & set(PARTS):
    y0, *_ = trainer.codec.apply(state.codec_vars, x,
                                 rng=jax.random.PRNGKey(9))
    y0 = jax.block_until_ready(y0)

if "codec_fwd" in PARTS:
    fl = flops_of(codec_fwd_fn, state.codec_vars, x, jax.random.PRNGKey(1))
    s = codec_fwd_fn(state.codec_vars, x, jax.random.PRNGKey(1))
    jax.block_until_ready(s)
    best = []
    for b in range(3):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(N):
            acc = codec_fwd_fn(state.codec_vars, x + 1e-12 * acc,
                               jax.random.PRNGKey(i))
        assert np.isfinite(float(jax.device_get(acc)))
        best.append((time.perf_counter() - t0) / N)
    record("codec_fwd", min(best), fl)

if "mrstft" in PARTS:
    fl = flops_of(mrstft_fn, x, y0)
    s = mrstft_fn(x, y0)
    jax.block_until_ready(s)
    best = []
    for b in range(3):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(N):
            acc = mrstft_fn(x + 1e-12 * acc, y0)
        assert np.isfinite(float(jax.device_get(acc)))
        best.append((time.perf_counter() - t0) / N)
    record("mrstft", min(best), fl)

if "disc_fwd" in PARTS:
    fl = flops_of(disc_fwd_fn, state.disc_vars, x, y0)
    s = disc_fwd_fn(state.disc_vars, x, y0)
    jax.block_until_ready(s)
    best = []
    for b in range(3):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(N):
            acc = disc_fwd_fn(state.disc_vars, x + 1e-12 * acc, y0)
        assert np.isfinite(float(jax.device_get(acc)))
        best.append((time.perf_counter() - t0) / N)
    record("disc_fwd", min(best), fl)


# ---- backward components (each returns loss + a grad-dependent scalar so
# the backward isn't dead-code-eliminated; chained like the forwards) ------

def _touch(grads):
    return jax.tree_util.tree_reduce(
        lambda a, g: a + g.ravel()[0], grads, jnp.float32(0))


@jax.jit
def codec_grad_fn(codec_vars, x, rng):
    def loss(p):
        y, yb, z, regloss, xb = trainer.codec.apply(
            {**codec_vars, "params": p}, x, rng=rng,
            rngs={"noise": jax.random.fold_in(rng, 1)})
        return jnp.mean(y * y) + regloss
    l, g = jax.value_and_grad(loss)(codec_vars["params"])
    return l + 1e-9 * _touch(g)


@jax.jit
def mrstft_grad_fn(x, y):
    n = min(x.shape[1], y.shape[1])

    def loss(yy):
        return multi_resolution_stft_loss(x[:, :n], yy, trainer.tc,
                                          trainer.cfg.sr)
    l, g = jax.value_and_grad(loss)(y[:, :n])
    return l + 1e-9 * g.ravel()[0]


@jax.jit
def disc_grad_fn(disc_vars, x, y):
    n = min(x.shape[1], y.shape[1])

    def loss(yy):
        loss_gen, _, _ = trainer.disc.apply(disc_vars, x[:, :n], yy)
        return loss_gen
    l, g = jax.value_and_grad(loss)(y[:, :n])
    return l + 1e-9 * g.ravel()[0]


def _run_chained(name, fn, arg):
    """fn: jitted single-array function; timed with chained perturbation."""
    fl = flops_of(fn, arg)
    jax.block_until_ready(fn(arg))
    best = []
    for b in range(3):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(N):
            acc = fn(arg + 1e-12 * acc)
        assert np.isfinite(float(jax.device_get(acc)))
        best.append((time.perf_counter() - t0) / N)
    record(name, min(best), fl)


if {"mrstft_grad", "disc_grad"} & set(PARTS) and y0 is None:
    y0, *_ = trainer.codec.apply(state.codec_vars, x,
                                 rng=jax.random.PRNGKey(9))
    y0 = jax.block_until_ready(y0)

if "codec_grad" in PARTS:
    _run_chained("codec_grad",
                 jax.jit(lambda cx: codec_grad_fn(state.codec_vars, cx,
                                                  jax.random.PRNGKey(1))), x)
if "mrstft_grad" in PARTS:
    _run_chained("mrstft_grad", jax.jit(lambda cx: mrstft_grad_fn(cx, y0)),
                 x)
if "disc_grad" in PARTS:
    _run_chained("disc_grad",
                 jax.jit(lambda cy: disc_grad_fn(state.disc_vars, x, cy)),
                 y0)

print(json.dumps({"metric": "ae_gen_step_decomposition", "batch": B,
                  "num_signal": NUM_SIGNAL,
                  "parts_ms": {k: v["ms"] for k, v in results.items()},
                  "parts_tflops": {
                      k: round(v["flops"] / (v["ms"] / 1e3) / 1e12, 2)
                      for k, v in results.items() if v["flops"]}}))


# ---- sub-codec decomposition (round 4): encoder vs decoder vs noise ------

if {"enc_fwd", "dec_fwd", "dec_nonoise", "dec_grad", "pqmf"} & set(PARTS):
    import dataclasses
    from after_tpu.models import AudioCodec

    codec = trainer.codec
    z0 = jax.block_until_ready(
        jax.jit(lambda cx: codec.apply(state.codec_vars, cx,
                                       method=AudioCodec.encode))(x))

if "pqmf" in PARTS:
    @jax.jit
    def pqmf_fn(cx):
        xb = codec.apply(state.codec_vars, cx,
                         method=lambda m, a: m.pqmf(a))
        return jnp.sum(xb) + cx.ravel()[0]
    _run_chained("pqmf", pqmf_fn, x)

if "enc_fwd" in PARTS:
    @jax.jit
    def enc_fn(cx):
        z = codec.apply(state.codec_vars, cx, method=AudioCodec.encode)
        return jnp.sum(z)
    _run_chained("enc_fwd", enc_fn, x)

if "dec_fwd" in PARTS:
    @jax.jit
    def dec_fn(cz):
        y = codec.apply(state.codec_vars, cz, method=AudioCodec.decode,
                        rngs={"noise": jax.random.PRNGKey(2)})
        return jnp.sum(y)
    _run_chained("dec_fwd", dec_fn, z0)

if "dec_nonoise" in PARTS:
    # same params tree (flax ignores the unused noise subtree): decoder
    # cost with the filtered-noise branch compiled out
    codec_nn = AudioCodec(dataclasses.replace(ae_cfg, use_noise=False))

    @jax.jit
    def dec_nn_fn(cz):
        y = codec_nn.apply(state.codec_vars, cz, method=AudioCodec.decode)
        return jnp.sum(y)
    _run_chained("dec_nonoise", dec_nn_fn, z0)

if "dec_grad" in PARTS:
    @jax.jit
    def dec_grad_fn2(cz):
        def loss(zz):
            y = codec.apply(state.codec_vars, zz, method=AudioCodec.decode,
                            rngs={"noise": jax.random.PRNGKey(2)})
            return jnp.mean(y * y)
        l, g = jax.value_and_grad(loss)(cz)
        return l + 1e-9 * g.ravel()[0]
    _run_chained("dec_grad", dec_grad_fn2, z0)
