"""Break down the non-march portion of a wavefront step: normals, BSDF,
camera gen, RNG, accumulation — identifies the next fusion target after the
Pallas march (tools/probe_split.py showed march is only ~28% of the step).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_split.py
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

from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import camera as cameralib
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.ops import march as marchlib
from raytracingpbr_tpu.ops import scene as scenelib
from raytracingpbr_tpu.ops import shade as shadelib

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


# build a mixed mid-path state like the bench does
state = make_frame_state(n)
frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, cfg))
px, state = frame(state)
for _ in range(5):
    px, state = frame(state)
jax.block_until_ready(px)
rays = state.rays

res = jax.jit(lambda o, d: marchlib.march(scene, o, d, cfg,
                                          differentiable=False))(
    rays.origin, rays.direction)
jax.block_until_ready(res)

timeit("calc_normal (jax.grad)", jax.jit(
    lambda i, p: scenelib.calc_normal(scene, i, p)), res.index, res.position)
timeit("calc_normal (tetra)", jax.jit(
    lambda i, p: scenelib.calc_normal_tetrahedron(scene, i, p)),
    res.index, res.position)

u4 = rnglib.uniform4(pixel_id, 3, 2, cfg.seed)
timeit("full interaction", jax.jit(
    lambda i, p, d: shadelib.ray_surface_interaction(scene, i, p, d, u4,
                                                     cfg)),
    res.index, res.position, rays.direction)

timeit("rng uniform4", jax.jit(
    lambda pid: rnglib.uniform4(pid, 3, 2, cfg.seed)), pixel_id)


def camgen(pid):
    u_cam = rnglib.uniform4(pid, 3, 1, cfg.seed)
    uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u_cam[0], u_cam[1])
    return cameralib.get_ray(cam, uv, u_cam[2], u_cam[3])


timeit("camera gen", jax.jit(camgen), pixel_id)

timeit("sky_color", jax.jit(
    lambda d: __import__("raytracingpbr_tpu.ops.ibl",
                         fromlist=["sky_color"]).sky_color(env, d)),
    rays.direction)

# trace-one-bounce without march: replace march with precomputed results
def bounce_no_march(rays_, idx, pos, hit):
    u4_ = rnglib.uniform4(pixel_id, 3, 2, cfg.seed)
    inter = shadelib.ray_surface_interaction(
        scene, idx, pos, rays_.direction, u4_, cfg)
    from raytracingpbr_tpu.core.math import brightness
    from raytracingpbr_tpu.ops.ibl import sky_color
    color_hit = rays_.color * inter.color_scale
    color_hit = color_hit * scene.emission[idx]
    color_miss = rays_.color * sky_color(env, rays_.direction)
    return jnp.where(hit[:, None], color_hit, color_miss)


timeit("bounce minus march", jax.jit(bounce_no_march),
       rays, res.index, res.position, res.hit)

step_j = jax.jit(lambda r, a: integ.wavefront_step(
    scene, env, cam, r, a, pixel_id, jnp.uint32(123), cfg))
timeit("full wavefront_step", step_j, rays, state.accum)
