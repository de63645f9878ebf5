"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_and_param_specs():
    from after_tpu.parallel import make_mesh, param_sharding_specs
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n_data=min(4, len(jax.devices()) // 2), n_model=2)
    assert mesh.axis_names == ("data", "model")

    params = {"block_0": {"attn": {"qkv": {"kernel": jnp.zeros((64, 192))}},
                          "mlp": {"Dense_0": {"kernel": jnp.zeros((64, 192)),
                                              "bias": jnp.zeros((192,))},
                                  "Dense_1": {"kernel": jnp.zeros((192, 64))}}},
              "out": {"kernel": jnp.zeros((64, 8))}}
    specs = param_sharding_specs(params)
    from jax.sharding import PartitionSpec as P
    assert specs["block_0"]["attn"]["qkv"]["kernel"] == P(None, "model")
    assert specs["block_0"]["mlp"]["Dense_1"]["kernel"] == P("model", None)
    assert specs["out"]["kernel"] == P()


@pytest.mark.slow
def test_dryrun_multichip_full_train_step():
    """The driver's multichip validation path: full diffusion train step
    jitted over a dp x tp mesh, one step executed."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(len(jax.devices()))


@pytest.mark.slow
def test_sharded_cfg_inference():
    """The 3xCFG batched sampler runs SPMD with the batch sharded over the
    data axis (SURVEY §2.4: optional inference sharding)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from after_tpu.parallel import make_mesh
    import sys
    sys.path.insert(0, "tests")
    from test_diffusion import micro_config
    from after_tpu.diffusion import RectifiedFlow

    cfg = micro_config()
    rf = RectifiedFlow(cfg)
    variables = rf.init(jax.random.PRNGKey(0), 4)
    mesh = make_mesh(n_data=4, n_model=1)
    bs = NamedSharding(mesh, P("data"))
    B, T, C = 4, 32, 8
    x0 = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, T, C)), bs)
    cond = jax.device_put(jnp.zeros((B, cfg.zt_channels)), bs)
    tcond = jax.device_put(jnp.zeros((B, T, cfg.zs_channels)), bs)
    with mesh:
        y = rf.sample(variables["net"], x0, cond, tcond, 2, 2.0, 1.0)
        jax.block_until_ready(y)
    assert y.shape == (B, T, C)
    # unsharded run must agree
    y2 = rf.sample(variables["net"], jax.device_get(x0),
                   jax.device_get(cond), jax.device_get(tcond), 2, 2.0, 1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-4)


def test_multihost_helpers_single_process():
    """Single-process path of the multi-host helpers: local batch -> global
    sharded array over the data axis (on a pod each process contributes its
    slice; the API is identical)."""
    from after_tpu.parallel import (global_batch_from_local,
                                    host_shard_kwargs, initialize_distributed,
                                    make_mesh)

    initialize_distributed()  # no-op single-process
    kw = host_shard_kwargs(16)
    assert kw["batch_size"] == 16 // jax.process_count()

    mesh = make_mesh(n_data=8, n_model=1)
    batch = {"x": np.arange(8 * 4 * 2, dtype=np.float32).reshape(8, 4, 2)}
    g = global_batch_from_local(batch, mesh)
    assert g["x"].shape == (8, 4, 2)
    assert len(g["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])


def test_tp_specs_tolerate_scan_layer_axis():
    """Scan-form block params (leading layer axis) must still receive
    model-axis shardings (VERDICT r1: rules silently missed ndim-3 leaves)."""
    from jax.sharding import PartitionSpec as P

    from after_tpu.parallel import param_sharding_specs

    params = {"blocks": {"block": {
        "attn": {"qkv": {"kernel": jnp.zeros((4, 64, 192))}},
        "mlp": {"Dense_0": {"kernel": jnp.zeros((4, 64, 128)),
                            "bias": jnp.zeros((4, 128))},
                "Dense_1": {"kernel": jnp.zeros((4, 128, 64))}}}}}
    specs = param_sharding_specs(params)
    blk = specs["blocks"]["block"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["Dense_0"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["Dense_0"]["bias"] == P(None, "model")
    assert blk["mlp"]["Dense_1"]["kernel"] == P(None, "model", None)


def test_tp_sharded_scan_forward_matches_replicated():
    """A scan_layers denoiser forward under TP shardings equals the
    unsharded forward."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_models import SMALL_DN

    from jax.sharding import NamedSharding, PartitionSpec as P
    from after_tpu.models.denoiser import Denoiser
    from after_tpu.parallel import (make_mesh, param_sharding_specs,
                                    shard_variables)

    cfg = dataclasses.replace(SMALL_DN, scan_layers=True)
    dn = Denoiser(cfg)
    B, T = 4, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, cfg.n_channels))
    t = jnp.full((B,), 0.4)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.cond_dim))
    tcond = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.tcond_dim))
    variables = dn.init(jax.random.PRNGKey(3), x, t, cond, tcond)

    # the scanned qkv kernel must actually get a model-axis spec
    specs = param_sharding_specs(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(
        specs, is_leaf=lambda s: isinstance(s, P))
    model_sharded = ["/".join(str(getattr(p, "key", p)) for p in path)
                     for path, s in flat if "model" in s]
    assert any("qkv" in p for p in model_sharded), model_sharded

    y_ref = dn.apply(variables, x, t, cond, tcond)

    mesh = make_mesh(n_data=min(4, len(jax.devices()) // 2), n_model=2)
    sharded = shard_variables(variables, mesh, tp=True)
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        y_tp = jax.jit(dn.apply)(sharded, xb, t, cond, tcond)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=2e-5)
