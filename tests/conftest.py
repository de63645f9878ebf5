"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile and execute without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The sandbox's axon TPU plugin pins JAX_PLATFORMS=axon at interpreter start;
# override it explicitly so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
