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
