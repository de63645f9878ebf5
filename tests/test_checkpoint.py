"""Checkpoint save/restore round trip + resume semantics."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import with_overrides
from after_tpu.diffusion.trainer import DiffusionTrainer
from after_tpu.utils.checkpoint import (available_steps, restore_checkpoint,
                                        save_checkpoint, filter_partial_load)
from tests.test_diffusion import micro_config
from tests.test_trainer import synthetic_batches


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = micro_config()
    cfg = with_overrides(cfg, {"train.timbre_warmup": 100})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), 2)
    state = tr.fit(state, synthetic_batches(3), max_steps=3)

    mdir = str(tmp_path / "run")
    save_checkpoint(mdir, state.step,
                    {"variables": state.variables,
                     "ema_params": state.ema_params, "step": state.step},
                    config_json="{}")
    assert available_steps(mdir) == [3]

    restored = restore_checkpoint(mdir)
    k0 = np.asarray(state.variables["net"]["params"]["patchify"]["kernel"])
    k1 = np.asarray(restored["variables"]["net"]["params"]["patchify"]["kernel"])
    np.testing.assert_array_equal(k0, k1)
    assert int(restored["step"]) == 3

    # resume and keep training
    state2 = tr.init(jax.random.PRNGKey(1), 2)
    state2 = dataclasses.replace(
        state2, variables=restored["variables"],
        ema_params=restored["ema_params"], step=int(restored["step"]))
    state2 = tr.fit(state2, synthetic_batches(2, seed=7), max_steps=5)
    assert state2.step == 5


def test_partial_load_masks():
    restored = {"encoder": 1, "encoder_time": 2, "net": 3}
    current = {"encoder": 10, "encoder_time": 20, "net": 30}
    out = filter_partial_load(restored, current, (True, False, True))
    assert out == {"encoder": 1, "encoder_time": 20, "net": 3}


def test_restore_is_topology_portable(tmp_path):
    """A checkpoint saved under an 8-device mesh restores in a process with
    a single device (production: train multi-chip, serve on one chip)."""
    import subprocess
    import sys

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    x = jax.device_put(jnp.arange(16.0).reshape(8, 2),
                       NamedSharding(mesh, P("data")))
    save_checkpoint(str(tmp_path), 0, {"a": x})

    code = f"""
import os
os.environ.pop("XLA_FLAGS", None)   # single CPU device
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import numpy as np
from after_tpu.utils.checkpoint import restore_checkpoint
assert len(jax.devices()) == 1, jax.devices()
r = restore_checkpoint({repr(str(tmp_path))})
assert float(np.asarray(r["a"]).sum()) == 120.0
print("PORTABLE_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0 and "PORTABLE_OK" in r.stdout, r.stderr[-1500:]
