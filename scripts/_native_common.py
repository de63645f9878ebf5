"""Shared pieces of the native stream_host check/bench scripts: the tiny
streaming test config and the axon relay environment for subprocesses."""
import os
import sys
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

TINY_OVERRIDES = {
    "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
    "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
    "encoder.channels": (16, 16, 16, 32),
    "encoder_time.channels": (16, 16, 16, 16, 12),
    "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
    "autoencoder.base_channels": 8, "autoencoder.multipliers": (1, 2, 2),
    "autoencoder.factors": (2, 2), "autoencoder.dilations": (1, 3),
    "autoencoder.num_blocks_per_stage": 1,
    "train.n_signal": 16,
}


def tiny_streaming_cfg(extra=None, drop=()):
    """The micro streaming config all native checks share; `extra` adds or
    replaces dotted overrides, `drop` removes base keys (e.g. the midi
    check drops encoder_time.channels and replaces the structure keys)."""
    from after_tpu.config import get_config, with_overrides
    ov = {k: v for k, v in TINY_OVERRIDES.items() if k not in set(drop)}
    ov.update(extra or {})
    cfg = get_config("tiny", "streaming")
    return with_overrides(cfg, ov).resolved(in_size=8, n_signal=16)


def axon_env():
    """Fresh-session axon relay env for a stream_host subprocess."""
    env = dict(os.environ)
    env["AFTER_PJRT_OPTIONS"] = (
        "remote_compile=1;local_only=0;priority=0;"
        "topology=v5e:1x1x1;n_slices=1;"
        f"session_id={uuid.uuid4()};rank=4294967295")
    env["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    env["AXON_LOOPBACK_RELAY"] = "1"
    env.pop("AFTER_NATIVE_CTRL", None)
    return env
