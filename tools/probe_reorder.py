"""Measure amortized depth-sorted lane reordering for the wavefront march.

The single-shot Pallas march pays ceil(tile_max/chunk)*chunk iterations per
(8,128) tile — the <1% deep-march tail poisons nearly every tile (66%
divergence tax, BENCH_r04). Per-step compaction lost by measurement
(tools/probe_phased.r4.out). This probe measures the cheaper lever VERDICT
r4 item 2b: permute rays into iteration-sorted tiles using the PREVIOUS
march's per-lane convergence counts (march_pallas's lane_iters output),
transiently around the march call — shade/deposit are elementwise, so only
the march sees the permuted order.

Measured quantities, on a realistic mixed-bounce cornell wavefront state:
  A. baseline march time + executed lane-iters
  B. oracle: march on rays sorted by their OWN iters (upper bound)
  C. realistic: march on rays sorted by the previous step's iters
     (with gather costs: permute origin/direction in, results out)
  D. permutation-build cost: argsort vs chunk-bucket counting sort

Run on TPU: python tools/probe_reorder.py
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

from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.pallas.march_kernel import TILE, march_pallas

scene = cornell.full_scene()
cfg = cornell.full_config().replace(samples_per_frame=4, max_raytrace=512,
                                    quality_per_sample=0.8)
cam = cornell.full_camera()
env = cornell.sky()
n = cfg.num_pixels

# mixed state: several frames from scratch (same recipe as probe_divergence)
state = make_frame_state(n)
frame_fn = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, cfg))
for _ in range(4):
    _, state = frame_fn(state)
rays_a = state.rays                      # state at step k (stale predictor)
_, state = frame_fn(state)
rays_b = state.rays                      # state at step k+4 (the march we time)
jax.block_until_ready(rays_b.origin)


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def executed(iters):
    it = np.asarray(iters).reshape(-1, TILE)
    chunk = 32
    per_tile = np.ceil(it.max(axis=1) / chunk) * chunk
    return float(per_tile.sum() * TILE), float(np.asarray(iters).sum())


march = jax.jit(lambda o, d: march_pallas(scene, o, d, cfg))

# --- A. baseline ---
dt_a, out_a = timeit(march, rays_b.origin, rays_b.direction)
ex_a, need = executed(out_a[3])
print(f"A baseline: {dt_a*1e3:.3f} ms  executed={ex_a/1e6:.2f}M "
      f"needed={need/1e6:.2f}M tax={ex_a/max(need,1):.2f}x", flush=True)

# --- D. permutation builders ---
iters_b = out_a[3]          # own iters (oracle key)
own_key = jnp.asarray(iters_b)

argsort = jax.jit(lambda k: jnp.argsort(-k))
dt_sort, perm_oracle = timeit(argsort, own_key)
print(f"D argsort(230k): {dt_sort*1e3:.3f} ms", flush=True)


@jax.jit
def bucket_perm(k):
    """Counting sort by descending chunk bucket (iters//32, clipped)."""
    b = jnp.minimum(k // 32, 16)
    b = 16 - b  # descending need
    order = jnp.argsort(b, stable=True)  # still a sort, for reference
    return order


@jax.jit
def onepass_perm(k):
    """Cheap 2-bucket partition: deep lanes (>=64 iters) first."""
    deep = (k >= 64).astype(jnp.int32)
    n_deep = jnp.sum(deep)
    pos = jnp.where(deep == 1, jnp.cumsum(deep) - 1,
                    n_deep + jnp.cumsum(1 - deep) - 1)
    return jnp.zeros_like(pos).at[pos].set(
        jnp.arange(k.shape[0], dtype=pos.dtype))


dt_part, perm2 = timeit(onepass_perm, own_key)
print(f"D 2-bucket partition: {dt_part*1e3:.3f} ms", flush=True)

# --- B. oracle sorted ---
march_perm = jax.jit(lambda o, d, p: march_pallas(scene, o[p], d[p], cfg))
dt_b, out_b = timeit(march_perm, rays_b.origin, rays_b.direction, perm_oracle)
ex_b, _ = executed(out_b[3])
print(f"B oracle-sorted (march+2 gathers): {dt_b*1e3:.3f} ms  "
      f"executed={ex_b/1e6:.2f}M tax={ex_b/max(need,1):.2f}x", flush=True)

# --- C. realistic: key = previous state's iters ---
march_stale = jax.jit(lambda o, d: march_pallas(scene, o, d, cfg))
prev_iters = march_stale(rays_a.origin, rays_a.direction)[3]
perm_stale = argsort(jnp.asarray(prev_iters))


@jax.jit
def march_with_perm_and_unperm(o, d, p):
    t, idx, hit, it = march_pallas(scene, o[p], d[p], cfg)
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0], dtype=p.dtype))
    return t[inv], idx[inv], hit[inv], it[inv]


dt_c, out_c = timeit(march_with_perm_and_unperm,
                     rays_b.origin, rays_b.direction, perm_stale)
exec_c, _ = executed(jnp.asarray(out_c[3])[perm_stale])
print(f"C stale-sorted (march+gathers+unperm): {dt_c*1e3:.3f} ms  "
      f"executed={exec_c/1e6:.2f}M tax={exec_c/max(need,1):.2f}x", flush=True)

# sanity: same results
np.testing.assert_array_equal(np.asarray(out_c[0]), np.asarray(out_a[0]))
print("results bit-identical: ok", flush=True)

# --- C2: 2-bucket stale partition ---
perm_stale2 = onepass_perm(jnp.asarray(prev_iters))
dt_c2, out_c2 = timeit(march_with_perm_and_unperm,
                       rays_b.origin, rays_b.direction, perm_stale2)
exec_c2, _ = executed(jnp.asarray(out_c2[3])[perm_stale2])
print(f"C2 stale-2bucket: {dt_c2*1e3:.3f} ms  "
      f"executed={exec_c2/1e6:.2f}M tax={exec_c2/max(need,1):.2f}x",
      flush=True)

# --- E. march time alone on PRE-permuted rays (no gather in the timed
# path): what a STATIC pixel->lane layout could achieve. block32: pixels in
# 32x32 screen blocks (a fixed, gather-free layout choice — the state can
# simply live in that order, like parallel/render's strided layout).
W, H = cfg.width, cfg.height
ids = np.arange(n)
x, y = ids % W, ids // W
bx, by = x // 32, y // 32
block_key = ((by * ((W + 31) // 32) + bx) * (1 << 20)
             + (y % 32) * 32 + (x % 32))
perm_block = jnp.asarray(np.argsort(block_key), jnp.int32)

o_sorted = jax.device_put(rays_b.origin[perm_oracle])
d_sorted = jax.device_put(rays_b.direction[perm_oracle])
o_block = jax.device_put(rays_b.origin[perm_block])
d_block = jax.device_put(rays_b.direction[perm_block])
jax.block_until_ready((o_sorted, o_block))

dt_e1, out_e1 = timeit(march, o_sorted, d_sorted)
ex_e1, _ = executed(out_e1[3])
print(f"E oracle pre-sorted march alone: {dt_e1*1e3:.3f} ms  "
      f"executed={ex_e1/1e6:.2f}M tax={ex_e1/max(need,1):.2f}x", flush=True)

dt_e2, out_e2 = timeit(march, o_block, d_block)
ex_e2, _ = executed(out_e2[3])
print(f"E block32 static-layout march alone: {dt_e2*1e3:.3f} ms  "
      f"executed={ex_e2/1e6:.2f}M tax={ex_e2/max(need,1):.2f}x", flush=True)
