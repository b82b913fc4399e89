"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require the real TPU: they run on the host CPU platform with
XLA's virtual device splitting so multi-chip sharding paths are exercised
(see dryrun_multichip in __graft_entry__.py for the driver-side check).
"""
import os

# Must be set before jax is imported anywhere. Overwrite, don't setdefault:
# the environment ships with JAX_PLATFORMS=axon (the tunneled TPU), and tests
# must not compete for the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize.py (axon TPU tunnel) force-sets
# jax_platforms="axon,cpu" at interpreter start, overriding JAX_PLATFORMS.
# Override it back: tests must run on the host CPU (virtual 8-device mesh),
# not compete for the single tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
# Compiles on this host are slow (tens of seconds for some kernels); cache
# them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
