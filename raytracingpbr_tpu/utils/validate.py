"""Numerical-health checks for ray state.

SURVEY.md §5 "Race detection / sanitizers": JAX's purity makes data races
impossible by construction; the real hazard is NaN/Inf creeping through the
ray state (e.g. grazing-refraction ``sqrt(k)``, src/pbr.py:53). These helpers
are the debug-mode analog of ``ti.init(debug=True)`` — cheap enough to run
per frame in development, off by default in production.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import FrameState


def state_health(state: FrameState) -> Dict[str, float]:
    """Host-side health summary of a FrameState (finite fractions, ranges)."""
    out = {}
    leaves = {
        "origin": state.rays.origin,
        "direction": state.rays.direction,
        "color": state.rays.color,
        "accum": state.accum,
        "pixels": state.pixels,
    }
    for name, arr in leaves.items():
        a = np.asarray(arr)
        out[f"{name}_finite_frac"] = float(np.isfinite(a).mean())
        out[f"{name}_absmax"] = float(np.abs(a[np.isfinite(a)]).max()
                                      if np.isfinite(a).any() else np.inf)
    d = np.asarray(state.rays.direction)
    norms = np.linalg.norm(d, axis=-1)
    finite = np.isfinite(norms)
    # respawn-pending rays may carry stale directions; check live lanes only
    live = np.asarray(state.rays.depth) > 0
    if live.any():
        out["live_direction_unit_frac"] = float(
            (np.abs(norms[live & finite] - 1.0) < 1e-3).mean())
    return out


def assert_state_finite(state: FrameState) -> None:
    """Raise with a readable report if any ray-state leaf went non-finite."""
    h = state_health(state)
    bad = {k: v for k, v in h.items()
           if k.endswith("finite_frac") and v < 1.0}
    if bad:
        raise FloatingPointError(f"non-finite ray state: {bad}")


def nan_guard(fn):
    """Wrap a jitted step function with jax.debug-style NaN detection on its
    outputs (development aid; adds a host sync per call)."""
    def wrapped(*args, **kw):
        out = fn(*args, **kw)
        for leaf in jax.tree.leaves(out):
            a = np.asarray(leaf)
            if not np.isfinite(a).all():
                raise FloatingPointError(
                    f"NaN/Inf in step output leaf shape={a.shape}")
        return out
    return wrapped
