"""Export round-trip: serialize the streaming graph with jax.export, reload,
and verify the exported methods reproduce the live Streamer outputs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import with_overrides
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming.export import ExportedStreamer, export_streamer
from after_tpu.streaming.streamer import Streamer
from tests.test_diffusion import micro_config


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = micro_config()
    cfg = with_overrides(cfg, {"autoencoder.causal": True,
                               "autoencoder.use_norm": False})
    streamer = Streamer(cfg, chunk_size=4)
    pipe = TransferPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("export") / "artifact")
    export_streamer(streamer, variables, out, nb_steps=2)
    return cfg, streamer, variables, out


def test_export_files(exported):
    _, streamer, _, out = exported
    assert os.path.exists(os.path.join(out, "manifest.json"))
    for m in ("structure", "timbre", "diffuse", "decode"):
        assert os.path.exists(os.path.join(out, f"{m}.stablehlo"))
    assert os.path.exists(os.path.join(out, "state", "initial_state.npz"))


def test_exported_matches_live(exported):
    cfg, streamer, variables, out = exported
    host = ExportedStreamer(out)
    audio = 0.05 * np.random.RandomState(0).randn(
        1, streamer.audio_chunk, 1).astype(np.float32)

    live_state = streamer.init_state(variables, 1)
    for i in range(3):
        y_live, live_state = streamer.structure(variables, live_state,
                                                jnp.asarray(audio))
        y_exp = host.call("structure", jnp.asarray(audio))
        np.testing.assert_allclose(np.asarray(y_exp), np.asarray(y_live),
                                   atol=1e-5)


def test_exported_full_chain_runs(exported):
    cfg, streamer, _, out = exported
    host = ExportedStreamer(out)
    audio = 0.05 * np.random.RandomState(1).randn(
        1, streamer.audio_chunk, 1).astype(np.float32)
    zs = host.call("structure", jnp.asarray(audio))
    zt = host.call("timbre", jnp.asarray(audio))
    rng = jax.random.key_data(jax.random.PRNGKey(0))
    z = host.call("diffuse", zs, zt, rng)
    y = host.call("decode", z)
    assert y.shape == (1, streamer.audio_chunk, 1)
    assert np.isfinite(np.asarray(y)).all()
