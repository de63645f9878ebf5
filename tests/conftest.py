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

# Persistent compilation cache: repeat suite runs skip recompiling unchanged
# graphs (the CPU suite is compile-dominated; same mechanism the TPU
# benchmarks rely on, CLAUDE.md).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (big XLA CPU compiles / e2e CLI runs); "
        "deselect with -m 'not slow' for the fast loop")
