"""The user-facing example scripts run end to end on micro checkpoints."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import (ae_to_json, get_config, to_json,
                              with_overrides)
from after_tpu.dataset.audio import save_wav
from after_tpu.dataset.midi import MidiFile, Note
from after_tpu.diffusion import TransferPipeline
from after_tpu.utils.checkpoint import save_checkpoint

# the full end-to-end runs cost ~3 min of XLA CPU compiles apiece; marked
# slow individually so the --help smoke keeps the scripts in the fast loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MICRO = {
    "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
    "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
    "encoder.channels": (16, 16, 16, 32),
    "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
    "autoencoder.base_channels": 8, "autoencoder.multipliers": (1, 2, 2),
    "autoencoder.factors": (2, 2), "autoencoder.dilations": (1, 3),
    "autoencoder.num_blocks_per_stage": 1,
    "train.n_signal": 16,
}


def _make_run(tmp_path, config_name, extra=None):
    cfg = with_overrides(get_config(config_name), {**MICRO, **(extra or {})})
    if config_name != "midi":
        cfg = with_overrides(
            cfg, {"encoder_time.channels": (16, 16, 16, 16, 12)})
    rcfg = cfg.resolved(in_size=8, n_signal=16)
    pipe = TransferPipeline(rcfg)
    variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)

    run = tmp_path / f"run_{config_name}"
    save_checkpoint(str(run), 0,
                    {"variables": variables["diffusion"],
                     "ema_params": variables["diffusion"]["net"]["params"]},
                    config_json=to_json(cfg))
    codec_dir = tmp_path / f"codec_{config_name}"
    save_checkpoint(str(codec_dir), 0, {"codec_vars": variables["codec"]},
                    config_json=ae_to_json(rcfg.autoencoder))
    return rcfg, str(run), str(codec_dir)


def _run(script, args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(REPO, script)] + args,
                       capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_example_scripts_parse_args():
    """Fast-loop smoke (VERDICT r3 #7): both example scripts import and
    expose their CLI surface (--help exits 0) without touching a model."""
    for script in ("examples/audio_to_audio_demo.py",
                   "examples/midi_to_audio_demo.py"):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, script), "--help"],
            capture_output=True, text=True, timeout=300, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        assert "--model_path" in r.stdout


@pytest.mark.slow
def test_audio_to_audio_demo(tmp_path):
    rcfg, run, codec = _make_run(tmp_path, "tiny")
    sr = rcfg.sr
    t = np.arange(sr) / sr
    save_wav(str(tmp_path / "s.wav"),
             (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    save_wav(str(tmp_path / "t.wav"),
             (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    out = str(tmp_path / "out.wav")
    _run("examples/audio_to_audio_demo.py",
         ["--model_path", run, "--emb_model_path", codec,
          "--structure", str(tmp_path / "s.wav"),
          "--timbre", str(tmp_path / "t.wav"), "--out", out,
          "--nb_steps", "2", "--seconds", "0.4"])
    from after_tpu.dataset.audio import load_wav
    y, _ = load_wav(out)
    assert len(y) > 0 and np.isfinite(y).all()


@pytest.mark.slow
def test_midi_to_audio_demo(tmp_path):
    rcfg, run, codec = _make_run(tmp_path, "midi")
    sr = rcfg.sr
    t = np.arange(sr) / sr
    save_wav(str(tmp_path / "t.wav"),
             (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)
    midi = MidiFile(notes=[Note(60, 100, 0.0, 0.5),
                           Note(64, 100, 0.5, 1.0)])
    midi.save(str(tmp_path / "in.mid"))
    out = str(tmp_path / "out.wav")
    _run("examples/midi_to_audio_demo.py",
         ["--model_path", run, "--emb_model_path", codec,
          "--midi", str(tmp_path / "in.mid"),
          "--timbre", str(tmp_path / "t.wav"), "--out", out,
          "--nb_steps", "2"])
    from after_tpu.dataset.audio import load_wav
    y, _ = load_wav(out)
    assert len(y) > 0 and np.isfinite(y).all()
