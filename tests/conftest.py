"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (the CI machine has at
most one real TPU chip).  The environment may pre-pin ``JAX_PLATFORMS`` to a
TPU plugin via sitecustomize, so we override both the env var *and* the jax
config after import (the latter wins as long as no backend has been
initialised yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()
