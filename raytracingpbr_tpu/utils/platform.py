"""Backend-selection helper.

Some environments register an out-of-tree TPU plugin via ``sitecustomize``
and override ``jax_platforms`` through ``jax.config`` at import time, which
silently defeats the standard ``JAX_PLATFORMS`` environment variable. Every
CLI entry point calls :func:`honor_jax_platforms` so the documented
``JAX_PLATFORMS=cpu python -m raytracingpbr_tpu.apps...`` contract holds
everywhere (tests do the same dance in ``tests/conftest.py``).
"""
from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    """Re-apply the JAX_PLATFORMS env var over any sitecustomize override.

    Call before the first jax array/device use (config updates after
    backend initialization are ignored or raise).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
