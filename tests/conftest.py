"""Test session config: run JAX on CPU with 8 fake devices.

The reference has no tests at all (SURVEY.md SS4); this suite follows the
strategy SURVEY.md SS4 mandates instead. The fake-device CPU mesh
(``--xla_force_host_platform_device_count``) is the "fake backend" used by
the sharding tests, matching how the driver dry-runs the multi-chip path.

Env vars must be set before jax initializes; this environment pins
``JAX_PLATFORMS=axon`` (the TPU tunnel) via sitecustomize, so we override it
here — tests must be fast and hermetic, not ride a network tunnel.
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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables after every test module.

    The full suite compiles hundreds of distinct XLA:CPU programs in one
    process; with enough accumulated LLVM-JIT state the CPU backend
    eventually SEGFAULTS inside backend_compile_and_load on an otherwise
    fine graph (reproduced in rounds 2 and 3 at different tests — always
    after ~40+ green tests, never in isolation). Dropping the executable
    caches between modules keeps the per-process compiler footprint
    bounded; the cost is re-compiling the handful of cross-module shared
    graphs."""
    yield
    jax.clear_caches()
