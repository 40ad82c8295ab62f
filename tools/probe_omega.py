"""Measure wavefront frame time and converged radiance vs march omega.

The cornell full-PBR bench marches with the v1 example's plain sphere
tracing (w=1.0, OmegaPolicy.CONSTANT — cornell_box.py:214-223). The src/
engine's enhanced sphere tracing (w=1.6 with rollback, src/scene.py:61-73)
visits the same hit set in fewer iterations: rollback makes over-relaxation
conservative. This probe quantifies the speedup and verifies estimator
equivalence (converged linear mean).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingpbr_tpu.config import OmegaPolicy
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ

cam = cornell.full_camera()
env = cornell.sky()
scene = cornell.full_scene()
base = cornell.full_config().replace(samples_per_frame=4, max_raytrace=512,
                                     quality_per_sample=0.8)

VARIANTS = [
    ("w=1.0 const (bench today)", dict()),
    ("w=1.2 rollback", dict(omega=1.2,
                            omega_policy=OmegaPolicy.ROLLBACK_TO_ONE)),
    ("w=1.6 rollback (src/ engine)", dict(
        omega=1.6, omega_policy=OmegaPolicy.ROLLBACK_TO_ONE)),
    ("w=2.0 rollback", dict(omega=2.0,
                            omega_policy=OmegaPolicy.ROLLBACK_TO_ONE)),
]

for name, kw in VARIANTS:
    cfg = base.replace(**kw)
    frame = jax.jit(lambda st, cfg=cfg: integ.render_frame(
        scene, env, cam, st, cfg))
    state = make_frame_state(cfg.num_pixels)
    px, state = frame(state)
    jax.block_until_ready(px)
    for _ in range(5):
        px, state = frame(state)
    jax.block_until_ready(px)
    c0 = float(state.accum[:, 3].sum())
    k = 10
    t0 = time.time()
    for _ in range(k):
        px, state = frame(state)
    jax.block_until_ready(px)
    dt = time.time() - t0
    c1 = float(state.accum[:, 3].sum())
    msps = (c1 - c0) / dt / 1e6
    # converge a while longer for the mean check
    for _ in range(24):
        px, state = frame(state)
    mean = float((state.accum[:, :3].sum()
                  / jnp.maximum(state.accum[:, 3:].sum(), 1.0)).mean())
    print(f"{name}: {dt/k*1e3:.2f} ms/frame, {msps:.3f} Msps, "
          f"converged linear mean {mean:.4f}", flush=True)
