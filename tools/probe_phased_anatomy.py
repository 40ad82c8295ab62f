"""Time the pieces of march_phased on TPU: partition, gathers, and each
pallas phase — to find where the 190 ms (vs 3.7 ms single-shot) goes."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import camera as cameralib
from raytracingpbr_tpu.pallas import march_kernel as mk

scene = cornell.full_scene()
cfg = cornell.full_config()
cam = cornell.full_camera()
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
r = cameralib.get_ray(cam, uv, u[2], u[3])
o, d = r.origin, r.direction

def bench(f, *a, label="", it=20):
    g = jax.jit(f)
    out = g(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(it):
        out = g(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / it
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return out

# 1. full phased vs single-shot
bench(lambda o, d: mk.march_pallas(scene, o, d, cfg)[0], o, d, label="single-shot 512")
bench(lambda o, d: mk.march_phased(scene, o, d, cfg)[0], o, d, label="phased (auto)")

# 2. one pallas phase of budget 32 with init state (the phased inner call)
params = mk.pack_scene(scene, escape_bound=False)
stypes = tuple(scene.shape_types)
br = float(scene.box_round)
rp = tuple(scene.rot_perm)
o_pad, np_ = mk._pad_to_tile(o)
d_pad, _ = mk._pad_to_tile(d)
num = o_pad.shape[0]
t0a = jnp.zeros((num,), jnp.float32)
w0 = jnp.full((num,), cfg.omega, jnp.float32)
s0 = jnp.zeros((num,), jnp.float32)
d0 = jnp.full((num,), 1e3, jnp.float32)
act = jnp.ones((num,), bool)

def phase32(o_pad, d_pad, t, w, s, dd):
    return mk._march_pallas_impl(params, None, o_pad, d_pad, act, stypes, br,
                                 cfg.replace(max_raymarch=32), rot_perm=rp,
                                 init=(t, w, s, dd))[0]

def phase32_noinit(o_pad, d_pad):
    return mk._march_pallas_impl(params, None, o_pad, d_pad, act, stypes, br,
                                 cfg.replace(max_raymarch=32), rot_perm=rp)[0]

bench(phase32_noinit, o_pad, d_pad, label="one phase b=32 no-init")
bench(phase32, o_pad, d_pad, t0a, w0, s0, d0, label="one phase b=32 with-init")

# 3. partition + gathers alone
done = jnp.zeros((num,), jnp.int32).at[: num // 100].set(1)
def permute(done, o_pad):
    perm = mk._partition_active(done)
    return o_pad[perm], perm
bench(permute, done, o_pad, label="partition+1 gather")
