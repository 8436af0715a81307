"""bench.wait_for_backend: bounded backend-availability gate.

During an axon-tunnel outage `jax.devices()` blocks indefinitely; the bench
must abort with a clear message instead of hanging the driver's round-end
run (CLAUDE.md measurement gotchas)."""
import importlib.util
import sys

import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", __file__.rsplit("/tests/", 1)[0] + "/bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_probe_succeeds_on_healthy_backend():
    bench = _load_bench()
    # force the probe child onto CPU via live config (the env var alone is
    # ignored here — sitecustomize force-registers the TPU plugin)
    bench.wait_for_backend(
        attempts=1, probe_timeout=120,
        probe_code=("import jax; jax.config.update('jax_platforms', 'cpu'); "
                    "print(jax.default_backend())"))


def test_probe_aborts_on_dead_backend():
    bench = _load_bench()
    with pytest.raises(SystemExit):
        bench.wait_for_backend(
            attempts=1, probe_timeout=30,
            probe_code="import time; time.sleep(3600)")  # simulated hang


def test_probe_aborts_on_failing_backend():
    bench = _load_bench()
    with pytest.raises(SystemExit):
        bench.wait_for_backend(
            attempts=1, probe_timeout=30,
            probe_code="raise RuntimeError('UNAVAILABLE: axon tunnel down')")
