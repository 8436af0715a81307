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
# persistent compile cache: the suite re-jits the same model programs every
# run (engines rebuild per test); caching executables across runs cuts the
# dominant cost. Keyed by program+platform, so CPU-mesh entries never leak
# into TPU runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/mere_fusion_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
