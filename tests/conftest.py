"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require the real TPU: they run on the host CPU platform with
XLA's virtual device splitting so multi-chip sharding paths are exercised
(see dryrun_multichip in __graft_entry__.py for the driver-side check).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# Compiles on this host are slow (tens of seconds for some kernels); cache
# them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
