import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.ops import camera as cameralib, march as marchlib
from raytracingpbr_tpu.models import cornell

scene = cornell.full_scene(); cfg = cornell.full_config()
cam = cornell.full_camera(); env = cornell.sky()
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
u_cam = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u_cam[0], u_cam[1])
rays = cameralib.get_ray(cam, uv, u_cam[2], u_cam[3])

t0=time.time()
probe = jax.jit(lambda o, d: marchlib.march(scene, o, d, cfg, differentiable=False))
res = probe(rays.origin, rays.direction)
jax.block_until_ready(res.t)
print('march compile+run:', time.time()-t0, flush=True)
print('bounce0 march iters:', int(res.iters), 'hit frac', float(res.hit.mean()), flush=True)
t0=time.time()
for _ in range(5): res = probe(rays.origin, rays.direction)
jax.block_until_ready(res.t)
print('march-only steady:', (time.time()-t0)/5, flush=True)

t0=time.time()
mk = jax.jit(lambda r, s: rt.megakernel_trace(scene, env, r, pid, s, cfg))
out = mk(rays, jnp.uint32(0))
jax.block_until_ready(out.color)
print('megakernel compile+run:', time.time()-t0, flush=True)
b = np.array(out.bounces)
print('bounce depth pct [50,90,99,100]:', np.percentile(b, [50,90,99,100]), flush=True)
t0=time.time()
for i in range(3): out = mk(rays, jnp.uint32(i))
jax.block_until_ready(out.color)
print('megakernel steady:', (time.time()-t0)/3, flush=True)
