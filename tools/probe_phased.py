"""Time the compacted multi-phase march vs single-shot on TPU (cornell
full-PBR, primary + mixed wavefront states), then the wavefront frame."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import camera as cameralib
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.pallas.march_kernel import march_pallas, march_phased

scene = cornell.full_scene()
cfg = cornell.full_config()
cam = cornell.full_camera()
env = cornell.sky()
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)

u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
primary = cameralib.get_ray(cam, uv, u[2], u[3])

state = make_frame_state(n)
step_fn = jax.jit(lambda st: integ.render_frame(
    scene, env, cam, st, cfg.replace(samples_per_frame=3,
                                     march_compaction=False)))
_, state = step_fn(state)
_, state = step_fn(state)
mixed = state.rays


def bench(f, o, d, label):
    g = jax.jit(lambda o, d: f(scene, o, d, cfg))
    jax.block_until_ready(g(o, d)[0])
    t0 = time.perf_counter()
    for _ in range(20):
        out = g(o, d)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / 20
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return out


for name, rr in (("primary", primary), ("mixed", mixed)):
    a = bench(march_pallas, rr.origin, rr.direction, f"{name} single-shot")
    b = bench(march_phased, rr.origin, rr.direction, f"{name} phased")
    for i, lbl in ((0, "t"), (1, "idx"), (2, "hit"), (3, "fin")):
        same = np.array_equal(np.asarray(a[i]), np.asarray(b[i]))
        if not same:
            print(f"  MISMATCH in {lbl}!", flush=True)
    print(f"  executed-need sum: {int(np.asarray(b[3]).sum())/1e6:.2f}M",
          flush=True)

# wavefront frame with and without compaction
for comp in (False, True):
    c = cfg.replace(samples_per_frame=4, max_raytrace=512,
                    quality_per_sample=0.8, march_compaction=comp)
    st = make_frame_state(n)
    frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, c))
    px, st = frame(st)
    jax.block_until_ready(px)
    for _ in range(3):
        px, st = frame(st)
    jax.block_until_ready(px)
    c0 = float(st.accum[:, 3].sum())
    t0 = time.perf_counter()
    for _ in range(10):
        px, st = frame(st)
    jax.block_until_ready(px)
    dt = (time.perf_counter() - t0) / 10
    c1 = float(st.accum[:, 3].sum())
    print(f"wavefront compaction={comp}: {dt*1e3:.1f} ms/frame, "
          f"{(c1-c0)/10/dt/1e6:.2f} Msamples/s", flush=True)
