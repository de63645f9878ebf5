"""Checkpoint save/restore round trip + resume semantics."""

import dataclasses

import jax
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
