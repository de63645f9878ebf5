"""Diffusion trainer integration tests on synthetic latent batches."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import with_overrides
from after_tpu.diffusion.trainer import (DiffusionTrainer,
                                         shuffle_time_chunks)
from tests.test_diffusion import micro_config


def synthetic_batches(n, B=2, T=32, C=8, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        z = rng.randn(B, T, C).astype(np.float32)
        yield {"x": z, "x_cond": z + 0.01 * rng.randn(*z.shape).astype(np.float32),
               "x_time_cond": z}


def test_shuffle_time_chunks():
    x = jnp.arange(2 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 3)
    y = shuffle_time_chunks(jax.random.PRNGKey(0), x, (4, 8))
    # same multiset of values per sample, different order (almost surely)
    np.testing.assert_allclose(np.sort(np.asarray(y), axis=1),
                               np.sort(np.asarray(x), axis=1))

    # the index-gather form is bit-identical to the materializing form it
    # replaced (same rng stream — reproducibility of existing runs)
    def materializing(rng, x, sizes):
        B, T, C = x.shape
        k_choice, *k_perms = jax.random.split(rng, len(sizes) + 1)
        variants = []
        for s, kp in zip(sizes, k_perms):
            nch = T // s
            xr = x[:, :nch * s].reshape(B, nch, s, C)
            perms = jax.vmap(lambda k: jax.random.permutation(k, nch))(
                jax.random.split(kp, B))
            shuffled = jax.vmap(lambda xi, p: xi[p])(xr, perms)
            shuffled = shuffled.reshape(B, nch * s, C)
            if nch * s < T:
                shuffled = jnp.concatenate([shuffled, x[:, nch * s:]],
                                           axis=1)
            variants.append(shuffled)
        choice = jax.random.randint(k_choice, (B,), 0, len(sizes))
        stacked = jnp.stack(variants, axis=0)
        return jnp.take_along_axis(
            stacked, choice[None, :, None, None], axis=0)[0]

    for key in (0, 1, 7):
        for sizes in ((4, 8), (5,), (8, 16, 32)):
            k = jax.random.PRNGKey(key)
            np.testing.assert_array_equal(
                np.asarray(shuffle_time_chunks(k, x, sizes)),
                np.asarray(materializing(k, x, sizes)))


@pytest.mark.slow
def test_phase1_training_steps():
    cfg = micro_config()
    cfg = with_overrides(cfg, {"train.timbre_warmup": 100,
                               "train.batch_size": 2})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    losses = []
    state = tr.fit(state, synthetic_batches(3), max_steps=3,
                   callback=lambda s, m: losses.append(m))
    assert state.step == 3
    assert all(np.isfinite(m["diffusion_loss"]) for m in losses)
    # phase 1: structure fully dropped, no adversarial loss
    assert all(m["adversarial_loss"] == 0.0 for m in losses)


@pytest.mark.slow
def test_mixed_precision_training_steps():
    """train.compute_dtype=bfloat16: forward/backward at bf16, master
    params / optimizer / EMA / batch_stats stay f32, losses finite and
    close to the f32 run's."""
    base = with_overrides(micro_config(), {
        "train.timbre_warmup": 0,
        "train.cycle_consistency": True,
        "train.cycle_start_step": 0,
        "train.cycle_weights": (0.1, 0.1),
        "train.update_classifier_every": 1,  # diffusion step every step
    })
    losses = {}
    for name, dtype in (("f32", None), ("bf16", "bfloat16")):
        cfg = with_overrides(base, {"train.compute_dtype": dtype})
        tr = DiffusionTrainer(cfg)
        state = tr.init(jax.random.PRNGKey(0), 2)
        log = []
        state = tr.fit(state, synthetic_batches(3), max_steps=3,
                       callback=lambda s, m: log.append(m))
        losses[name] = [float(m["diffusion_loss"]) for m in log]
        # master state must remain f32 regardless of compute dtype
        for leaf in jax.tree_util.tree_leaves(
                (state.variables, state.opt_state, state.ema_params)):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                assert leaf.dtype == jnp.float32, leaf.dtype
    assert all(np.isfinite(v) for v in losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["f32"],
                               rtol=0.1, atol=0.05)


@pytest.mark.slow
def test_phase2_with_classifier_and_cycle():
    cfg = micro_config()
    cfg = with_overrides(cfg, {
        "train.timbre_warmup": 0,
        "train.cycle_consistency": True,
        "train.cycle_start_step": 0,
        "train.cycle_weights": (0.1, 0.1),
        "train.cycle_loss_type": "mse_margin_0.05",
        "train.cycle_scaling": "ramps",
        "train.update_classifier_every": 2,
    })
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    metrics_log = []
    state = tr.fit(state, synthetic_batches(4), max_steps=4,
                   callback=lambda s, m: metrics_log.append(m))
    assert state.step == 4
    # steps 1 and 3 are classifier steps (step % 2 != 0)
    cls_steps = [m for m in metrics_log if "classifier_loss" in m]
    diff_steps = [m for m in metrics_log if "diffusion_loss" in m]
    assert len(cls_steps) == 2 and len(diff_steps) == 2
    for m in diff_steps:
        assert np.isfinite(m["loss"])
    # cycle kicks in strictly after cycle_start_step (step 0 is excluded)
    assert any(m["cycle_cond"] != 0.0 for m in diff_steps)


@pytest.mark.slow
def test_multi_step_window_matches_single_steps():
    """One multi_step window (lax.scan + per-step lax.cond) must reproduce
    the same K single-jit steps with identical per-step rng keys — the
    steps_per_call fast path may not change training semantics."""
    cfg = with_overrides(micro_config(), {
        "train.timbre_warmup": 0,
        "train.update_classifier_every": 3,
    })
    tr = DiffusionTrainer(cfg)
    # adam's sign-normalized updates amplify f32 fusion drift on near-zero
    # grads to lr scale, which would mask real wiring bugs; SGD keeps the
    # comparison linear in the grads, so equality is tight
    import optax
    tr.optimizer = optax.apply_if_finite(optax.sgd(1e-2), 6)
    tr.cls_optimizer = optax.apply_if_finite(optax.sgd(1e-2), 6)
    state = tr.init(jax.random.PRNGKey(0), 2)
    batches = list(synthetic_batches(3))
    krng = jax.random.PRNGKey(7)
    ks = jax.random.split(krng, 3)

    # the single-step jits donate their inputs: give the reference pass its
    # own buffers so `state` stays alive for the scan pass below
    ref = dataclasses.replace(
        state,
        variables=jax.tree_util.tree_map(jnp.copy, state.variables),
        opt_state=jax.tree_util.tree_map(jnp.copy, state.opt_state),
        cls_opt_state=jax.tree_util.tree_map(jnp.copy, state.cls_opt_state),
        ema_params=jax.tree_util.tree_map(jnp.copy, state.ema_params))
    for i in range(3):
        b = {k: jnp.asarray(v) for k, v in batches[i].items()}
        step = ref.step
        if step % 3 != 0:  # classifier step
            (variables, cls_opt), _ = tr.classifier_step(
                (ref.variables, ref.cls_opt_state), b, ks[i])
            ref = dataclasses.replace(ref, variables=variables,
                                      cls_opt_state=cls_opt, step=step + 1)
        else:
            adv_w, reg_w = tr.schedule_weights(step)
            (variables, opt_state, ema), _ = tr.train_step(
                (ref.variables, ref.opt_state, ref.ema_params), b, ks[i],
                False, True, True, False, adv_w, reg_w)
            ref = dataclasses.replace(ref, variables=variables,
                                      opt_state=opt_state, ema_params=ema,
                                      step=step + 1)

    out, metrics = tr._scan_window(state, batches, krng, None)
    assert out.step == 3
    for name, a, b in (("variables", out.variables, ref.variables),
                       ("ema", out.ema_params, ref.ema_params)):
        # scan+cond fuses differently than the separate jits, so allow f32
        # drift; with SGD a wiring bug (wrong rng/branch/batch) would show
        # at grad scale, far above this tolerance
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5), a, b)
    assert np.isfinite(float(metrics["diffusion_loss"]))
    assert np.isfinite(float(metrics["classifier_loss"]))


@pytest.mark.slow
def test_fit_steps_per_call_windows_and_boundaries():
    """fit with steps_per_call=2: scans aligned windows, falls back to
    single steps across the phase boundary, and the callback sees steps
    advance in window increments."""
    cfg = with_overrides(micro_config(), {
        "train.timbre_warmup": 3,          # boundary inside [2, 4)
        "train.update_classifier_every": 2,
        "train.steps_per_call": 2,
    })
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    seen = []
    state = tr.fit(state, synthetic_batches(7), max_steps=7,
                   callback=lambda s, m: seen.append(s.step))
    assert state.step == 7
    # [0,2) scanned; 2,3 single (boundary at 3); [4,6) scanned; 6 single
    assert seen == [2, 3, 4, 6, 7]


@pytest.mark.slow
def test_params_change_and_net_only_in_phase1_frozen_encoders():
    cfg = micro_config()
    cfg = with_overrides(cfg, {"train.timbre_warmup": 100,
                               "train.train_encoder": False})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    p0 = jax.tree_util.tree_map(np.asarray, state.variables)
    state = tr.fit(state, synthetic_batches(2), max_steps=2)
    # net changed
    k0 = p0["net"]["params"]["patchify"]["kernel"]
    k1 = np.asarray(state.variables["net"]["params"]["patchify"]["kernel"])
    assert not np.allclose(k0, k1)
    # frozen encoder params identical
    e0 = jax.tree_util.tree_leaves(p0["encoder"]["params"])
    e1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray,
                               state.variables["encoder"]["params"]))
    for a, b in zip(e0, e1):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_nonfinite_batch_skips_update_and_batch_stats():
    """A batch whose backward produces non-finite gradients must not poison
    params, Adam moments, or BN running stats (optax.apply_if_finite guard;
    zero-batch-variance BN backward explodes on degenerate/silent batches)."""
    cfg = micro_config()
    cfg = with_overrides(cfg, {"train.timbre_warmup": 0,
                               "train.batch_size": 2})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    before = jax.tree_util.tree_map(np.asarray, state.variables)

    z = np.full((2, 32, 8), np.nan, np.float32)
    batch = {"x": z, "x_cond": z,
             "x_time_cond": np.zeros((2, 32, 8), np.float32)}
    (variables, opt_state, ema), metrics = tr.train_step(
        (state.variables, state.opt_state, state.ema_params), batch,
        jax.random.PRNGKey(1), False, True, True, False, 0.0, 1.0)

    assert int(metrics["skipped_nonfinite"]) == 1
    after = jax.tree_util.tree_map(np.asarray, variables)
    for name in ("net", "encoder", "encoder_time"):
        for a, b in zip(jax.tree_util.tree_leaves(before[name]),
                        jax.tree_util.tree_leaves(after[name])):
            np.testing.assert_array_equal(a, b)

    # a good batch afterwards still applies normally
    good = np.random.RandomState(0).randn(2, 32, 8).astype(np.float32)
    batch = {"x": good, "x_cond": good,
             "x_time_cond": np.zeros((2, 32, 8), np.float32)}
    (variables, _, _), metrics = tr.train_step(
        (variables, opt_state, ema), batch,
        jax.random.PRNGKey(2), False, True, True, False, 0.0, 1.0)
    assert np.isfinite(float(metrics["loss"]))
    k0 = before["net"]["params"]["patchify"]["kernel"]
    k1 = np.asarray(variables["net"]["params"]["patchify"]["kernel"])
    assert not np.allclose(k0, k1)
    assert all(np.isfinite(l).all()
               for l in jax.tree_util.tree_leaves(
                   jax.tree_util.tree_map(np.asarray, variables)))


@pytest.mark.slow
def test_training_with_scan_layers():
    """scan_layers trains: gradients flow through the nn.scan blocks and the
    loss decreases on the micro synthetic task."""
    cfg = micro_config()
    cfg = dataclasses.replace(
        cfg, denoiser=dataclasses.replace(cfg.denoiser, scan_layers=True))
    cfg = with_overrides(cfg, {"train.timbre_warmup": 100,
                               "train.batch_size": 2})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    assert "blocks" in state.variables["net"]["params"]
    losses = []
    state = tr.fit(state, synthetic_batches(30), max_steps=30,
                   callback=lambda s, m: losses.append(
                       float(m["diffusion_loss"])))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


@pytest.mark.slow
def test_rbg_rng_impl_training_steps():
    """train.rng_impl='rbg' routes the whole training rng chain through the
    TPU-friendly generator (1.17x faster steps at B=64, PARITY.md); the
    loop must run and learn with the alternative key type end to end."""
    cfg = micro_config()
    cfg = with_overrides(cfg, {"train.timbre_warmup": 100,
                               "train.batch_size": 2,
                               "train.rng_impl": "rbg"})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    losses = []
    state = tr.fit(state, synthetic_batches(3), max_steps=3,
                   callback=lambda s, m: losses.append(m))
    assert state.step == 3
    assert all(np.isfinite(m["diffusion_loss"]) for m in losses)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["v1", "unet1d"])
def test_alternative_denoiser_backbones_train_and_sample(arch):
    """denoiser.arch selects the reference's gin-selectable net slot
    (base.gin net=@DenoiserV2; transformer.py:555 v1 / unet1d.py:255 UNET1D):
    full train steps + the CFG sampler must run on each backbone."""
    from after_tpu.diffusion import RectifiedFlow

    cfg = micro_config()
    cfg = with_overrides(cfg, {
        "denoiser.arch": arch,
        "denoiser.unet_channels": (16, 16),
        "denoiser.unet_ratios": (2, 2),
        "train.timbre_warmup": 100,
        "train.batch_size": 2,
    })
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    losses = []
    state = tr.fit(state, synthetic_batches(3), max_steps=3,
                   callback=lambda s, m: losses.append(m))
    assert state.step == 3
    assert all(np.isfinite(m["diffusion_loss"]) for m in losses)

    rf = RectifiedFlow(cfg)
    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 32, 8),
                     jnp.float32)
    cond = jnp.zeros((2, cfg.zt_channels))
    tcond = jnp.zeros((2, 32, cfg.zs_channels))
    y = rf.sample({"params": state.ema_params}, x0, cond, tcond, 2)
    assert y.shape == x0.shape and np.isfinite(np.asarray(y)).all()


def test_unet1d_backbone_rejects_streaming():
    from after_tpu.streaming import Streamer

    cfg = with_overrides(micro_config(), {"denoiser.arch": "unet1d"})
    with pytest.raises(ValueError, match="offline-only"):
        Streamer(cfg, chunk_size=4)
