"""A/B the MXU bunny-MLP path against the VPU FMA unroll (VERDICT r4 #3).

Parity first (march results on primary bunny rays, both packings), then
wavefront frame throughput on the bunny metal + glass workloads with
cfg.bunny_mxu off/on. Run on TPU: python tools/probe_bunny_mxu.py
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

from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import bunny
from raytracingpbr_tpu.ops import camera as cameralib
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.pallas.march_kernel import march_pallas

print("backend:", jax.default_backend(), flush=True)
np.asarray(jnp.ones((8,)) * 2.0)

scene = bunny.metal_scene()
env = bunny.glass_environment()
cfg = bunny.metal_config().replace(resolution=(960, 540))
cam = bunny.camera(cfg.width / cfg.height)

# --- parity: primary rays, both paths ---
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
rays = cameralib.get_ray(cam, uv, u[2], u[3])

res_vpu = march_pallas(scene, rays.origin, rays.direction,
                       cfg.replace(bunny_mxu=False))
res_mxu = march_pallas(scene, rays.origin, rays.direction,
                       cfg.replace(bunny_mxu=True))
t_v, t_m = np.asarray(res_vpu[0]), np.asarray(res_mxu[0])
hit_v, hit_m = np.asarray(res_vpu[2]), np.asarray(res_mxu[2])
agree = (hit_v == hit_m).mean()
dt = np.abs(t_v - t_m)[hit_v & hit_m]
print(f"parity: hit agree {agree*100:.4f}%  |t| diff max "
      f"{dt.max() if dt.size else 0:.2e} mean {dt.mean() if dt.size else 0:.2e}",
      flush=True)

# --- throughput: wavefront frames ---
for name, sc, e, cm, base in (
        ("bunny metal 960x540", scene, env, cam, cfg),
        ("bunny glass 960x540", bunny.glass_scene(), env,
         bunny.camera(960 / 540),
         bunny.glass_config().replace(resolution=(960, 540)))):
    for mxu in (False, True):
        c = base.replace(samples_per_frame=4, bunny_mxu=mxu)
        frame = jax.jit(lambda st, sc=sc, e=e, cm=cm, c=c:
                        integ.render_frame(sc, e, cm, st, c))
        state = make_frame_state(c.num_pixels)
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
        dtm = time.time() - t0
        c1 = float(state.accum[:, 3].sum())
        print(f"{name} mxu={mxu}: {dtm/k*1e3:.2f} ms/frame, "
              f"{(c1-c0)/dtm/1e6:.3f} Msps", flush=True)
