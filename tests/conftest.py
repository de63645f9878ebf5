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
# benchmarks rely on, CLAUDE.md).  The dir is fingerprinted by the host's
# CPU flags: XLA:CPU AOT entries encode machine features (+avx512 etc.),
# and loading an entry compiled on a previous session's different host can
# SIGILL mid-test (observed as a segfault in the suite; the loader itself
# warns "could lead to execution errors such as SIGILL").
import hashlib


def _cpu_fingerprint():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(f"~/.cache/jax_tests_{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (big XLA CPU compiles / e2e CLI runs); "
        "deselect with -m 'not slow' for the fast loop")
