"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is exercised on a virtual CPU mesh exactly as the
reference exercises "multi-node without a cluster" via `mpirun -np 8` on one
box (SURVEY.md §4.2).
"""
import os

# The session environment points JAX at a TPU tunnel and a sitecustomize
# pre-imports jax, so plain env vars are read too late; use config updates.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
