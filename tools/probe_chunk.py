"""Sweep the Pallas march-loop chunk size for a given omega policy.

The chunk amortizes the cross-lane convergence reduction, but every masked
post-convergence iteration inside a chunk is wasted VPU work — the optimum
shifts with the per-ray iteration count (over-relaxed marches converge in
fewer steps and want smaller chunks). Run after changing omega defaults.
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
base = cornell.full_config().replace(
    samples_per_frame=4, max_raytrace=512, quality_per_sample=0.8,
    omega=1.6, omega_policy=OmegaPolicy.ROLLBACK_TO_ONE)

chunks = tuple(int(a) for a in _sys.argv[1:]) or (8, 16, 32, 64)
for chunk in chunks:
    cfg = base.replace(march_chunk=chunk)
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
    print(f"chunk={chunk}: {dt/k*1e3:.2f} ms/frame, "
          f"{(c1-c0)/dt/1e6:.3f} Msps", flush=True)
