"""Split wavefront frame time: pallas march alone vs full wavefront step.

Identifies where the cornell-full-PBR bench frame spends its time so the
next kernel-fusion decision is data-driven.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), flush=True)

from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.ops import march as marchlib
from raytracingpbr_tpu.ops import camera as cameralib
from raytracingpbr_tpu.core import rng as rnglib

scene = cornell.full_scene()
cfg = cornell.full_config().replace(samples_per_frame=4, max_raytrace=512,
                                    quality_per_sample=0.8)
cam = cornell.full_camera()
env = cornell.sky()
n = cfg.num_pixels
pixel_id = jnp.arange(n, dtype=jnp.uint32)


def timeit(name, f, *args, k=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(k):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / k
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# camera-ray batch (primary rays: the march budget workload)
u = rnglib.uniform4(pixel_id, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pixel_id, cfg.width, cfg.height, u[0], u[1])
rays = cameralib.get_ray(cam, uv, u[2], u[3])

# differentiable=False matches the wavefront_step call (no _hit_t refinement)
march_j = jax.jit(lambda o, d: marchlib.march(scene, o, d, cfg,
                                              differentiable=False))
t_march = timeit("march primary (pallas)", march_j, rays.origin,
                 rays.direction)

# march on a mid-path mixed batch (advance state a few frames first)
state = make_frame_state(n)
frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, cfg))
px, state = frame(state)
for _ in range(5):
    px, state = frame(state)
jax.block_until_ready(px)
mixed = state.rays
t_march2 = timeit("march mixed-state (pallas)", march_j, mixed.origin,
                  mixed.direction)

# one full wavefront step
step_j = jax.jit(lambda r, a: integ.wavefront_step(
    scene, env, cam, r, a, pixel_id, jnp.uint32(123), cfg))
t_step = timeit("wavefront_step (march+shade+rr)", step_j, mixed,
                state.accum)

# full frame (4 steps + post)
out = frame(state)
jax.block_until_ready(out[0])
t0 = time.time()
k = 10
for _ in range(k):
    px, state = frame(state)
jax.block_until_ready(px)
t_frame = (time.time() - t0) / k
print(f"frame (4 steps + post): {t_frame*1e3:.2f} ms", flush=True)
print(f"-> non-march overhead/step: {(t_step - t_march2)*1e3:.2f} ms",
      flush=True)
print(f"-> post+glue/frame: {(t_frame - 4*t_step)*1e3:.2f} ms", flush=True)
