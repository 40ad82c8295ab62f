"""Quantify the march divergence tax and what would recover it.

Dumps per-lane convergence iteration counts (march_pallas 4th output) for
(a) fresh primary camera rays and (b) a realistic mixed-bounce wavefront
state on cornell full-PBR, then models executed-work = sum over tiles of
ceil(tile_max/chunk)*chunk under different pixel->lane layouts:

  * xmajor  — current flat layout (a (8,128) tile = ~2.1 scanlines)
  * block32 — 32x32 screen blocks per half-tile (spatially local tiles)
  * sorted  — oracle: lanes sorted by their own need (upper bound on any
              reordering scheme)

and chunks {8, 16, 32}; also wall-times the real kernel per chunk.
Run on TPU: python tools/probe_divergence.py
"""
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
from raytracingpbr_tpu.pallas.march_kernel import TILE, march_pallas

scene = cornell.full_scene()
cfg = cornell.full_config()
cam = cornell.full_camera()
env = cornell.sky()
W, H = cfg.width, cfg.height
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)

u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, W, H, u[0], u[1])
primary = cameralib.get_ray(cam, uv, u[2], u[3])

# mixed state: 12 wavefront steps from scratch
state = make_frame_state(n)
rays = None
step_fn = jax.jit(lambda st: integ.render_frame(scene, env, cam, st,
                                                cfg.replace(samples_per_frame=3)))
_, state = step_fn(state)
_, state = step_fn(state)
mixed = state.rays
print("mixed depth histo:", np.bincount(
    np.abs(np.asarray(state.rays.depth)).clip(0, 20)), flush=True)


def layouts(fin):
    img = fin.reshape(W, H)  # x-major
    out = {}
    out["xmajor"] = fin
    # 32x32 blocks scanned block-by-block
    b = 32
    blocks = img[: W // b * b, : H // b * b].reshape(W // b, b, H // b, b)
    out["block32"] = np.transpose(blocks, (0, 2, 1, 3)).reshape(-1)
    out["sorted"] = np.sort(fin)
    return out


def executed(fin, chunk):
    pad = (-fin.shape[0]) % TILE
    if pad:
        fin = np.concatenate([fin, np.zeros(pad, np.int64)])
    tmax = fin.reshape(-1, TILE).max(1)
    return int(np.minimum(-(-tmax // chunk) * chunk, cfg.max_raymarch).sum()) * TILE


for label, rr in (("primary", primary), ("mixed", mixed)):
    f = jax.jit(lambda o, d, c: march_pallas(scene, o, d, cfg.replace(march_chunk=c)if c else cfg, active=None),
                static_argnums=2)
    t, idx, hit, lane_iters = f(rr.origin, rr.direction, None)
    fin = np.asarray(jax.device_get(lane_iters), np.int64)
    need = int(fin.sum())
    print(f"\n== {label}: need {need/1e6:.2f}M lane-iters, "
          f"mean {fin.mean():.1f}, p50 {np.percentile(fin,50):.0f}, "
          f"p99 {np.percentile(fin,99):.0f}, max {fin.max()}")
    for lname, arr in layouts(fin).items():
        row = [f"{lname:8s}"]
        for chunk in (8, 16, 32):
            ex = executed(arr, chunk)
            row.append(f"c{chunk}: {ex/1e6:6.2f}M ({100*(1-need/ex):4.1f}% tax)")
        print("  ".join(row), flush=True)
    # real wall time per chunk
    for chunk in (8, 16, 32):
        g = jax.jit(lambda o, d: march_pallas(
            scene, o, d, cfg.replace(march_chunk=chunk), active=None))
        jax.block_until_ready(g(rr.origin, rr.direction)[0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(rr.origin, rr.direction)
        jax.block_until_ready(out[0])
        print(f"  chunk {chunk}: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
              flush=True)
