"""Test harness: force CPU with 8 virtual devices so every sharding /
collective test runs without TPU hardware (SURVEY.md §4 — the JAX answer to
multi-host testing).

Hardware gate (VERDICT r3 item 2): ``RT_TPU=1 python -m pytest tests -m tpu``
runs the ``tpu``-marked subset (tests/test_tpu.py — Mosaic-compiled Pallas
numerics, phased-vs-single-shot equality, a wavefront throughput floor) on
the real chip instead of the CPU stand-in. Without RT_TPU=1 the tpu subset
is skipped and everything else runs on the virtual 8-device CPU mesh, as
before. The round workflow runs the gate next to bench.py so a
perf-affecting default can never ship unmeasured again.

Note: this environment's sitecustomize registers a remote TPU backend and
*overrides* ``jax_platforms`` via ``jax.config`` at import time, so setting
the ``JAX_PLATFORMS`` env var is not enough — we must update the config after
importing jax."""
import os

import pytest

ON_TPU = os.environ.get("RT_TPU", "") == "1"

if not ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (run with RT_TPU=1)")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop XLA executables between test modules.

    The full suite (~150 XLA-CPU compilations) deterministically segfaulted
    inside ``backend_compile_and_load`` at the same late test on this
    machine (VERDICT r4 weak 1) while every subset passed — an
    accumulated-compiler-state failure. Clearing JAX's compiled-program
    caches at module boundaries bounds that state; the cost is re-tracing
    shared helpers (a few seconds per module), the benefit is a suite that
    can certify green in ONE invocation."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if ON_TPU:
        return
    skip = pytest.mark.skip(reason="TPU hardware test; run with RT_TPU=1")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
