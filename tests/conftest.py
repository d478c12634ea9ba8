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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A single-process run of the full suite compiles hundreds of distinct
    programs; without this the XLA:CPU compiler's arena grows past ~4 GB RSS
    and eventually segfaults mid-compile (observed at ~85% of the suite).
    Clearing per module keeps within-module reuse (the expensive compiles)
    while bounding lifetime memory.
    """
    yield
    from particles_tpu import core, smc_samplers

    core._runner_cache.clear()
    smc_samplers._sampler_jit_cache.clear()
    jax.clear_caches()
    gc.collect()
