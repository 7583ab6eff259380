"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated here without TPU hardware; the
driver separately dry-runs the multi-chip path via __graft_entry__.py.

Note: this environment's sitecustomize force-registers a remote TPU
backend and overrides JAX_PLATFORMS, so the env var alone is not enough —
we must update jax.config after import (backends initialize lazily, so
this still happens early enough).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
