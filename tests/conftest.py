"""Test harness: force an 8-device virtual CPU mesh.

All tests run on CPU so multi-chip shardings (dp/tp meshes) can be validated
without TPU hardware; the driver's dryrun does the same. The environment's
sitecustomize registers a TPU PJRT plugin unconditionally, so the platform
must be overridden via jax.config after import, not just JAX_PLATFORMS.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
