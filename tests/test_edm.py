"""EDM (Karras) diffusion variant: the reference's `after train --model edm`
surface (dead code upstream — after_scripts/train.py:91-93 imports a class
that does not exist; SURVEY §2.5).  Here it must train, sample, stream and
ride the same trainer/pipeline machinery as rectified flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import from_json, to_json, with_overrides
from after_tpu.diffusion import EDM, make_model
from after_tpu.diffusion.trainer import DiffusionTrainer
from after_tpu.streaming.state import init_stream_state
from tests.test_diffusion import micro_config


def edm_config(**over):
    cfg = with_overrides(micro_config(), {"diffusion_type": "edm", **over})
    return cfg


def test_factory_and_config_roundtrip():
    cfg = edm_config(**{"edm.sigma_data": 0.7, "edm.heun": False})
    model = make_model(cfg)
    assert isinstance(model, EDM)
    cfg2 = from_json(to_json(cfg))
    assert cfg2.diffusion_type == "edm"
    assert cfg2.edm.sigma_data == 0.7 and cfg2.edm.heun is False
    # default config still builds rectified flow
    assert not isinstance(make_model(micro_config()), EDM)


def test_preconditioning_identities():
    """c_skip -> 1 / c_out -> 0 as sigma -> 0 (D == x on clean data);
    weights satisfy lambda * c_out^2 == 1 (EDM Table 1)."""
    model = EDM(edm_config())
    sd = model.cfg.edm.sigma_data
    sigma = jnp.asarray([1e-6, 0.1, sd, 10.0, 80.0])
    c_skip, c_out, c_in, c_noise = model._precond(sigma)
    np.testing.assert_allclose(float(c_skip[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(c_out[0]), 0.0, atol=1e-5)
    lam = (sigma ** 2 + sd ** 2) / (sigma * sd) ** 2
    np.testing.assert_allclose(np.asarray(lam * c_out ** 2),
                               np.ones(5), rtol=1e-5)
    # sigma = sigma_data is the symmetric point: c_skip = 1/2
    np.testing.assert_allclose(float(c_skip[2]), 0.5, rtol=1e-6)


def test_sigma_schedule():
    model = EDM(edm_config())
    e = model.cfg.edm
    nb = jnp.float32(8.0)
    s0 = float(model._sigma_at(jnp.float32(0.0), nb))
    s_last = float(model._sigma_at(jnp.float32(7.0), nb))
    s_end = float(model._sigma_at(jnp.float32(8.0), nb))
    np.testing.assert_allclose(s0, e.sigma_max, rtol=1e-5)
    np.testing.assert_allclose(s_last, e.sigma_min, rtol=1e-4)
    assert s_end == 0.0
    # single-step schedule: sigma_0 = sigma_max, sigma_1 = 0
    nb1 = jnp.float32(1.0)
    np.testing.assert_allclose(
        float(model._sigma_at(jnp.float32(0.0), nb1)), e.sigma_max,
        rtol=1e-5)
    assert float(model._sigma_at(jnp.float32(1.0), nb1)) == 0.0
    # monotonically decreasing
    sig = [float(model._sigma_at(jnp.float32(i), nb)) for i in range(9)]
    assert all(a > b for a, b in zip(sig, sig[1:]))


@pytest.mark.slow
def test_edm_loss_and_grad():
    cfg = edm_config()
    model = make_model(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    B, T, C = 2, 32, 8
    x1 = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    tcond = jnp.zeros((B, T, cfg.zs_channels))
    cond = jnp.zeros((B, cfg.zt_channels))

    def loss_fn(p):
        loss, (x_noised, t) = model.diffusion_loss(
            p, jax.random.PRNGKey(2), x1, tcond, cond)
        return loss, (x_noised, t)

    (loss, (x_noised, t)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["net"])
    assert np.isfinite(float(loss))
    assert x_noised.shape == x1.shape
    # aux t = c_skip in (0, 1]
    tv = np.asarray(t)
    assert tv.shape == (B, 1, 1) and (tv > 0).all() and (tv <= 1).all()
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert float(gnorm) > 0


@pytest.mark.slow
def test_edm_sampler_euler_and_heun():
    cfg = edm_config()
    model = make_model(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    B, T, C = 1, 32, 8
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    cond = jnp.zeros((B, cfg.zt_channels))
    tcond = jnp.zeros((B, T, cfg.zs_channels))
    y_heun = model.sample(variables["net"], x0, cond, tcond, 4, 2.0, 1.0)
    assert y_heun.shape == x0.shape
    assert np.isfinite(np.asarray(y_heun)).all()

    model_e = make_model(with_overrides(cfg, {"edm.heun": False}))
    y_euler = model_e.sample(variables["net"], x0, cond, tcond, 4, 2.0, 1.0)
    assert np.isfinite(np.asarray(y_euler)).all()
    # different integrators genuinely diverge
    assert float(jnp.abs(y_heun - y_euler).max()) > 1e-6
    # deterministic
    y2 = model.sample(variables["net"], x0, cond, tcond, 4, 2.0, 1.0)
    np.testing.assert_array_equal(np.asarray(y_heun), np.asarray(y2))


@pytest.mark.slow
def test_edm_streaming_sampler_equals_offline():
    """Chunked streaming Euler == offline Euler (causal backbone, per-step
    KV caches) — the same invariant the rectified sampler pins down."""
    cfg = edm_config(**{"edm.heun": False})
    model = make_model(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    B, T, C = 1, 32, 8
    nb_steps = 3
    chunk = cfg.denoiser.attention_chunk_size
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.zt_channels))
    tcond = jax.random.normal(jax.random.PRNGKey(3), (B, T, cfg.zs_channels))

    y_off = model.sample(variables["net"], x0, cond, tcond, nb_steps,
                         1.5, 1.0)

    cache = init_stream_state(
        model.net_stream, jnp.zeros((3 * B, chunk, C)), jnp.zeros((3 * B,)),
        jnp.zeros((3 * B, cfg.zt_channels)),
        jnp.zeros((3 * B, chunk, cfg.zs_channels)))
    outs = []
    for i in range(0, T, chunk):
        y, cache = model.sample_stream(
            variables["net"], cache, x0[:, i:i + chunk], cond,
            tcond[:, i:i + chunk], nb_steps, 1.5, 1.0)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_off),
                               atol=5e-4)


@pytest.mark.slow
def test_edm_export_runtime_attributes(tmp_path):
    """An EDM model rides the same export machinery: StableHLO artifacts
    with nb_steps / guidances as live-settable runtime attributes, exported
    == live at each setting (the Karras ladder is computed in-graph from
    the runtime step count)."""
    import jax.random

    from after_tpu.diffusion import TransferPipeline
    from after_tpu.streaming.export import ExportedStreamer, export_streamer
    from after_tpu.streaming.streamer import Streamer

    cfg = edm_config(**{"autoencoder.causal": True,
                        "autoencoder.use_norm": False})
    streamer = Streamer(cfg, chunk_size=4)
    assert isinstance(streamer.rf, EDM)
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "edm_artifact")
    export_streamer(streamer, variables, out, nb_steps=2)

    host = ExportedStreamer(out)
    rng0 = np.random.RandomState(11)
    zs = jnp.asarray(rng0.randn(1, 4, cfg.zs_channels).astype(np.float32))
    zt = jnp.asarray(rng0.randn(1, cfg.zt_channels).astype(np.float32))
    live_state = streamer.init_state(variables, 1)
    for i, (nb, gt, gs) in enumerate([(1, 1.0, 1.0), (3, 2.0, 0.5)]):
        host.set_attribute("nb_steps", nb)
        host.set_attribute("guidance_timbre", gt)
        host.set_attribute("guidance_structure", gs)
        key = jax.random.PRNGKey(100 + i)
        z_exp = host.call("diffuse", zs, zt, jax.random.key_data(key))
        z_live, live_state = streamer.diffuse(variables, live_state, zs, zt,
                                              nb, gt, gs, rng=key)
        np.testing.assert_allclose(np.asarray(z_exp), np.asarray(z_live),
                                   atol=1e-5)


@pytest.mark.slow
def test_edm_trainer_full_curriculum_steps():
    """The full trainer (phase 2, classifier, cycle) runs on the EDM model
    with finite losses — --model edm end-to-end."""
    from tests.test_trainer import synthetic_batches
    cfg = edm_config(**{
        "train.timbre_warmup": 0,
        "train.cycle_consistency": True,
        "train.cycle_start_step": 0,
        "train.cycle_weights": (0.1, 0.1),
        "train.update_classifier_every": 2,
        "train.batch_size": 2,
    })
    tr = DiffusionTrainer(cfg)
    assert isinstance(tr.rf, EDM)
    state = tr.init(jax.random.PRNGKey(0), 2)
    log = []
    state = tr.fit(state, synthetic_batches(4), max_steps=4,
                   callback=lambda s, m: log.append(m))
    assert state.step == 4
    diff = [m for m in log if "diffusion_loss" in m]
    assert diff and all(np.isfinite(float(m["diffusion_loss"]))
                        for m in diff)
    assert all(np.isfinite(float(m["cycle_cond"])) for m in diff)
