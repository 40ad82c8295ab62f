"""Test harness: force CPU with 8 virtual devices so every sharding /
collective test runs without TPU hardware (SURVEY.md §4 — the JAX answer to
multi-host testing).

Note: this environment's sitecustomize registers a remote TPU backend and
*overrides* ``jax_platforms`` via ``jax.config`` at import time, so setting
the ``JAX_PLATFORMS`` env var is not enough — we must update the config after
importing jax."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
