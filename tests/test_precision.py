"""bf16 compute-path tests: output quality vs f32, dtype hygiene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from after_tpu.config import get_config, with_overrides
from after_tpu.diffusion import TransferPipeline
from after_tpu.streaming import Streamer
from after_tpu.utils.precision import cast_floating, resolve_dtype

# the pipeline tests jit a full graph twice (f32 + bf16): ~1 min apiece on
# CPU, marked slow individually; the dtype-hygiene unit tests stay fast


def micro_cfg(n_signal=32, streaming=False):
    names = ("tiny", "streaming") if streaming else ("tiny",)
    cfg = get_config(*names)
    cfg = with_overrides(cfg, {
        "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
        "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
        "encoder.channels": (16, 16, 16, 32),
        "encoder_time.channels": (16, 16, 16, 16, 12),
        "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
        "autoencoder.base_channels": 8, "autoencoder.multipliers": (1, 2, 2),
        "autoencoder.factors": (2, 2), "autoencoder.dilations": (1, 3),
        "autoencoder.num_blocks_per_stage": 1,
        "train.n_signal": n_signal,
    })
    return cfg.resolved(in_size=8, n_signal=n_signal)


def test_resolve_dtype():
    assert resolve_dtype(None) is None
    assert resolve_dtype("bf16") == jnp.bfloat16
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype("f32") == jnp.float32
    assert resolve_dtype(jnp.bfloat16) == jnp.bfloat16


def test_cast_floating_skips_ints():
    tree = {"a": jnp.zeros((2,), jnp.float32), "b": jnp.zeros((2,), jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


@pytest.mark.slow
def test_pipeline_bf16_close_to_f32():
    cfg = micro_cfg(n_signal=32)
    pipe32 = TransferPipeline(cfg)
    pipe16 = TransferPipeline(cfg, compute_dtype="bfloat16")
    variables = jax.jit(pipe32.init, static_argnums=1)(jax.random.PRNGKey(0),
                                                       1)
    T = 32 * cfg.autoencoder.ratio
    rng = np.random.RandomState(0)
    a = jnp.asarray(0.1 * rng.randn(1, T, 1).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(1, T, 1).astype(np.float32))
    y32 = np.asarray(pipe32.transfer(variables, a, b, 4))
    y16 = np.asarray(pipe16.transfer(variables, a, b, 4))
    assert y16.dtype == np.float32
    cos = float(np.sum(y32 * y16)
                / (np.linalg.norm(y32) * np.linalg.norm(y16) + 1e-12))
    assert cos > 0.99, cos


@pytest.mark.slow
def test_streamer_bf16_runs_and_matches():
    cfg = micro_cfg(n_signal=16, streaming=True)
    pipe = TransferPipeline(cfg)
    variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
    s32 = Streamer(cfg, chunk_size=4)
    s16 = Streamer(cfg, chunk_size=4, compute_dtype="bfloat16")
    v16 = s16.prepare_variables(variables)
    st32 = s32.init_state(variables)
    st16 = s16.init_state(v16)
    # KV caches and ring buffers live at the compute dtype
    assert st16.prev_timbre.dtype == jnp.bfloat16
    rng = np.random.RandomState(0)
    A = s32.audio_chunk
    y32s, y16s = [], []
    for _ in range(4):
        a = jnp.asarray(0.1 * rng.randn(1, A, 1).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(1, A, 1).astype(np.float32))
        y32, st32 = s32.forward(variables, st32, a, b, 2)
        y16, st16 = s16.forward(v16, st16, a, b, 2)
        y32s.append(np.asarray(y32))
        y16s.append(np.asarray(y16))
    y32 = np.concatenate(y32s, 1)
    y16 = np.concatenate(y16s, 1)
    assert y16.dtype == np.float32
    cos = float(np.sum(y32 * y16)
                / (np.linalg.norm(y32) * np.linalg.norm(y16) + 1e-12))
    assert cos > 0.98, cos


@pytest.mark.slow
def test_export_bf16_streamer_roundtrip(tmp_path):
    """A bf16 Streamer exports (state dtypes recorded as bfloat16) and the
    exported artifact reproduces the live bf16 host."""
    import json

    from after_tpu.streaming.export import ExportedStreamer, export_streamer

    cfg = micro_cfg(n_signal=16, streaming=True)
    pipe = TransferPipeline(cfg)
    variables = jax.jit(pipe.init, static_argnums=1)(jax.random.PRNGKey(0), 1)
    s16 = Streamer(cfg, chunk_size=4, compute_dtype="bfloat16")
    v16 = s16.prepare_variables(variables)

    out = str(tmp_path / "art16")
    export_streamer(s16, v16, out, nb_steps=2)
    manifest = json.load(open(out + "/manifest.json"))
    assert "bfloat16" in manifest["state_dtypes"]

    host = ExportedStreamer(out)
    state = s16.init_state(v16)
    rng = np.random.RandomState(0)
    A = s16.audio_chunk
    for c in range(3):
        a = jnp.asarray(0.1 * rng.randn(1, A, 1).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(1, A, 1).astype(np.float32))
        key = jax.random.wrap_key_data(
            jnp.asarray([c + 1, 42], jnp.uint32))
        zs_live, state = s16.structure(v16, state, a)
        zt_live, state = s16.timbre(v16, state, b)
        z_live, state = s16.diffuse(v16, state, zs_live, zt_live, 2, rng=key)
        y_live, state = s16.decode(v16, state, z_live)

        zs = host.call("structure", a)
        zt = host.call("timbre", b)
        z = host.call("diffuse", zs, zt,
                      jnp.asarray([c + 1, 42], jnp.uint32))
        y = host.call("decode", z)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_live),
                                   atol=1e-4, err_msg=f"chunk {c}")
