"""Run a tool on the CPU backend: `python tools/_cpu.py tools/foo.py args...`

The container's sitecustomize force-registers the axon TPU plugin and sets
jax_platforms explicitly, so env vars alone don't move JAX to CPU
(CLAUDE.md); this does the same config dance as tests/conftest.py before
exec'ing the target script.
"""
import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
from jax._src import xla_bridge as _xb

jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends
    clear_backends()
assert jax.devices()[0].platform == "cpu"

target = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(target, run_name="__main__")
