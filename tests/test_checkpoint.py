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


@pytest.mark.slow
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


@pytest.mark.slow
def test_full_state_resume_bit_exact(tmp_path):
    """Saving/restoring the FULL train state (incl. Adam moments and the
    classifier optimizer) makes a resumed run continue bit-exact vs. an
    uninterrupted one (reference saves opt_state, model.py:157,241-246)."""
    cfg = micro_config()
    cfg = with_overrides(cfg, {"train.timbre_warmup": 0,
                               "train.update_classifier_every": 3})
    tr = DiffusionTrainer(cfg)
    s = tr.init(jax.random.PRNGKey(0), 2)
    s = tr.fit(s, synthetic_batches(4), max_steps=4,
               rng=jax.random.PRNGKey(5))

    mdir = str(tmp_path / "run")
    save_checkpoint(mdir, s.step,
                    {"variables": s.variables, "ema_params": s.ema_params,
                     "opt_state": s.opt_state,
                     "cls_opt_state": s.cls_opt_state, "step": s.step})

    # uninterrupted continuation (donates s's buffers — checkpoint already
    # written above)
    cont = tr.fit(s, synthetic_batches(3, seed=9), max_steps=7,
                  rng=jax.random.PRNGKey(6))

    # fresh process equivalent: new trainer, restore with target so optax
    # namedtuple structure is preserved
    tr2 = DiffusionTrainer(cfg)
    fresh = tr2.init(jax.random.PRNGKey(123), 2)
    target = {"variables": fresh.variables, "ema_params": fresh.ema_params,
              "opt_state": fresh.opt_state,
              "cls_opt_state": fresh.cls_opt_state, "step": 0}
    restored = restore_checkpoint(mdir, target=target)
    s2 = dataclasses.replace(
        fresh, variables=restored["variables"],
        ema_params=restored["ema_params"],
        opt_state=restored["opt_state"],
        cls_opt_state=restored["cls_opt_state"],
        step=int(restored["step"]))
    cont2 = tr2.fit(s2, synthetic_batches(3, seed=9), max_steps=7,
                    rng=jax.random.PRNGKey(6))

    assert cont.step == cont2.step == 7
    for name in ("variables", "opt_state", "cls_opt_state", "ema_params"):
        a = jax.tree_util.tree_leaves(getattr(cont, name))
        b = jax.tree_util.tree_leaves(getattr(cont2, name))
        assert len(a) == len(b) and a, name
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=name)


def test_checkpoint_keys_backcompat(tmp_path):
    """Older checkpoints without optimizer state are detectable so restores
    can fall back to fresh optimizers."""
    from after_tpu.utils.checkpoint import checkpoint_keys
    save_checkpoint(str(tmp_path), 5,
                    {"variables": {"net": jnp.zeros((2,))},
                     "ema_params": jnp.zeros((2,)), "step": 5})
    keys = set(checkpoint_keys(str(tmp_path)))
    assert "variables" in keys and "opt_state" not in keys


def test_partial_load_masks():
    restored = {"encoder": 1, "encoder_time": 2, "net": 3}
    current = {"encoder": 10, "encoder_time": 20, "net": 30}
    out = filter_partial_load(restored, current, (True, False, True))
    assert out == {"encoder": 1, "encoder_time": 20, "net": 3}


def test_partial_load_keeps_unflagged_subtrees():
    """Subtrees outside the three flags (the adversarial classifier) must be
    loaded from the checkpoint, not silently re-initialised; subtrees absent
    from the checkpoint stay fresh."""
    restored = {"encoder": 1, "net": 3, "classifier": 4}
    current = {"encoder": 10, "encoder_time": 20, "net": 30,
               "classifier": 40}
    out = filter_partial_load(restored, current, (True, True, True))
    assert out == {"encoder": 1, "encoder_time": 20, "net": 3,
                   "classifier": 4}


def test_partial_load_drops_stale_and_mismatched_subtrees():
    """Checkpoint-only subtrees are dropped (a midi restart must not
    inherit an audio run's encoder_time) and a subtree whose leaf shapes
    no longer match the current config stays fresh instead of crashing
    the first train step."""
    restored = {"net": {"w": np.zeros((4, 4))},
                "encoder_time": {"w": np.zeros((2,))},      # not in config
                "classifier": {"w": np.zeros((8, 8))}}      # resized since
    current = {"net": {"w": np.ones((4, 4))},
               "classifier": {"w": np.ones((6, 6))}}
    out = filter_partial_load(restored, current, (True, True, True))
    assert "encoder_time" not in out
    np.testing.assert_array_equal(out["net"]["w"], np.zeros((4, 4)))
    np.testing.assert_array_equal(out["classifier"]["w"],
                                  np.ones((6, 6)))  # fresh, not 8x8


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


def test_corrupted_checkpoint_names_the_real_cause(tmp_path):
    """VERDICT r2 #9: a genuinely corrupted checkpoint must raise an error
    naming the corruption (DATA_LOSS / decoding failure), not a confusing
    downstream structure/shape error from a silent broad-except fallback."""
    import glob

    tree = {"variables": {"net": {"params": {"w": jnp.ones((4, 4)),
                                             "b": jnp.zeros((4,))}}},
            "step": 3}
    save_checkpoint(str(tmp_path), 3, tree)
    for f in (glob.glob(str(tmp_path / "checkpoint_3" / "d" / "*"))
              + glob.glob(str(tmp_path / "checkpoint_3" / "manifest.ocdbt"))):
        open(f, "wb").write(b"corrupt")

    with pytest.raises(Exception, match="DATA_LOSS|decod|manifest|corrupt"):
        restore_checkpoint(str(tmp_path), 3)
