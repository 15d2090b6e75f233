"""Test config: run the suite on a simulated 8-device CPU backend.

Must run before any test imports jax (SURVEY.md §4: the standard JAX
fake-backend technique for testing multi-chip sharding without a slice).
The container's sitecustomize registers the axon TPU plugin and sets
jax_platforms explicitly, so an env var is not enough -- override the config
after import. bench.py and production use the real TPU; tests run on CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses we may spawn
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
from jax._src import xla_bridge as _xb

jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends
    clear_backends()

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
