"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_and_param_specs():
    from after_tpu.parallel import make_mesh, param_sharding_specs
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(n_data=len(jax.devices()) // 2, n_model=2)
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


def test_dryrun_multichip_full_train_step():
    """The driver's multichip validation path: full diffusion train step
    jitted over a dp x tp mesh, one step executed."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(len(jax.devices()))
