"""Test harness config: force CPU JAX with 8 virtual devices for sharding tests.

The sandbox pre-registers an 'axon' TPU PJRT plugin via sitecustomize and pins
JAX_PLATFORMS=axon before any conftest runs, so env vars alone cannot switch
the platform — jax.config.update is required.  Must run before any test
module initializes a JAX backend.
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
