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
