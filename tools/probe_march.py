"""Measure the pallas march alone vs the full wavefront step (post-chunking)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.ops import camera as cameralib, march as marchlib, integrator as integ
from raytracingpbr_tpu.models import cornell

scene = cornell.full_scene()
cfg = cornell.full_config().replace(samples_per_frame=4)
cam = cornell.full_camera(); env = cornell.sky()
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
rays = cameralib.get_ray(cam, uv, u[2], u[3])

m = jax.jit(lambda o, d: marchlib.march(scene, o, d, cfg, differentiable=False))
r = m(rays.origin, rays.direction); jax.block_until_ready(r.t)
t0=time.time()
for _ in range(10): r = m(rays.origin, rays.direction)
jax.block_until_ready(r.t)
print('pallas march alone: %.4f s (hit %.3f)' % ((time.time()-t0)/10, float(r.hit.mean())), flush=True)

st = make_frame_state(n)
fr = jax.jit(lambda s: integ.render_frame(scene, env, cam, s, cfg))
px, st = fr(st); jax.block_until_ready(px)
t0=time.time()
for _ in range(10): px, st = fr(st)
jax.block_until_ready(px)
print('frame (4 steps): %.4f s -> %.4f s/step' % ((time.time()-t0)/10, (time.time()-t0)/40), flush=True)
