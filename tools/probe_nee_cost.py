"""Decompose the per-bounce cost of NEE (round 5).

The shadow-march diet (cfg.shadow_diet) left replay+NEE throughput
unchanged (0.436 vs 0.433 Msps) — so the ~3.5 ms/bounce NEE tax is NOT
march-iteration-bound. This probe times each NEE ingredient on a 230k-lane
batch: the alias-table draw (gathers), the radiance fetch, env_pdf, the
lobe/specular densities, and the shadow march with diet on/off.
Run on TPU: python tools/probe_nee_cost.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import camera as cameralib
from raytracingpbr_tpu.ops import ibl as ibllib
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.ops import march as marchlib
from raytracingpbr_tpu.ops import scene as scenelib
from raytracingpbr_tpu.ops import shade as shadelib

print("backend:", jax.default_backend(), flush=True)
np.asarray(jnp.ones((8,)) * 2.0)

scene = cornell.full_scene()
cfg = cornell.full_config().replace(env_sampling=True)
cam = cornell.full_camera()
img = np.full((32, 16, 3), 0.05, np.float32)
img[8:12, 11:15] = 25.0
env = ibllib.with_env_sampler(
    rt.hdr_environment(jnp.asarray(img), prebake=False))

n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
rays = cameralib.get_ray(cam, uv, u[2], u[3])
res = marchlib.march(scene, rays.origin, rays.direction, cfg,
                     differentiable=False)
u4 = rnglib.uniform4(pid, 0, 2, cfg.seed)
inter = shadelib.ray_surface_interaction(scene, res.index, res.position,
                                         rays.direction, u4, cfg)
gate = res.hit


def timeit(name, f, *args, reps=20):
    out = jax.block_until_ready(f(*args))
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms",
          flush=True)


uu = rnglib.uniform4(pid, 1, integ._S_NEE, cfg.seed)

timeit("sample_env_baked (alias draw + radiance)",
       jax.jit(lambda a, b, c, d: ibllib.sample_env_baked(
           env, a, b, u_jitter=(c, d))), uu[0], uu[1], uu[2], uu[3])

d_l, radiance, pdf = ibllib.sample_env_baked(env, uu[0], uu[1],
                                             u_jitter=(uu[2], uu[3]))

timeit("env_pdf(direction)",
       jax.jit(lambda d: ibllib.env_pdf(env, d)), d_l)

timeit("diffuse_lobe_prob",
       jax.jit(lambda d: shadelib.diffuse_lobe_prob(
           scene, res.index, rays.direction, inter.normal, inter.outer, d,
           cfg)), d_l)

timeit("specular_env_density",
       jax.jit(lambda d: shadelib.specular_env_density(
           scene, res.index, rays.direction, inter.normal, inter.outer, d,
           cfg)), d_l)

origin = res.position + inter.normal * cfg.min_dis
for diet in (True, False):
    c = cfg.replace(shadow_diet=diet)
    timeit(f"shadow march (diet={diet})",
           jax.jit(lambda o, d, g, c=c: integ.shadow_march(
               scene, o, d, c, g)), origin, d_l, gate)

timeit("full _nee_env",
       jax.jit(lambda g: integ._nee_env(
           scene, env, res.index, res.position, rays.direction,
           inter.normal, inter.outer,
           scenelib.materials_at(scene, res.index).albedo,
           g, pid, 1, cfg)), gate)
