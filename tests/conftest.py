"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's verification strategy of running every compute
backend against the same oracle (`test-configurations.sh`): unit tests are
hardware-independent; multi-chip sharding tests use the forced 8-device
host platform.

Note: this environment force-registers a TPU platform from sitecustomize
and overrides jax_platforms at import time, so we must re-override via
jax.config AFTER importing jax (env vars alone are ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
