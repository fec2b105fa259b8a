"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without a pod via XLA's host-platform
device-count override (SURVEY.md §4c). Must run before jax is imported
anywhere, hence the env mutation at conftest import time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
