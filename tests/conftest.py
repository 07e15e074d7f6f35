"""Test env: force CPU with 8 virtual devices so sharding tests run without
real multi-chip hardware.

Note: this image pre-imports jax at interpreter startup (sitecustomize for
the axon TPU tunnel), so JAX_PLATFORMS/XLA_FLAGS env vars are read before any
conftest code runs -- use jax.config.update instead, which works as long as
no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent XLA cache segfaults deserializing interpret-mode Pallas
# executables (jax 0.9 compilation_cache.get_executable_and_time); tests use
# interpret mode throughout, so opt out before softbodysim_tpu is imported.
os.environ["SOFTBODYSIM_NO_COMPILE_CACHE"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
