"""Model the budget-capped split march for the wavefront (no gathers).

Idea (round 5): instead of reordering lanes (measured out — gathers cost
more than the march, tools/probe_reorder.py), cap each wavefront step's
march at B iterations and carry unconverged lanes' exact loop state
(t, w, s, d — the march_phased ``init`` mechanism) to the next step. A
tile's per-step cost drops from ceil(tile_max/chunk)*chunk with
tile_max<=512 to <=B; the deep tail spreads over steps while tile-mates
advance their own fresh segments — work overlaps instead of serializing.

Stage 1 (this script): dump the real per-lane need vector from a mixed
cornell wavefront state on hardware, then SIMULATE the steady-state
executed/consumed tax for caps B in {32,64,128,256,512} with segment
refills resampled from the empirical distribution. If the modeled tax
improves ~2x, implement it for real.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "probe_split_needs.npy")

if os.path.exists(CACHE):
    need = np.load(CACHE)
    TILE = 1024
    print(f"loaded cached needs {need.shape}", flush=True)
else:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingpbr_tpu.core.types import make_frame_state
    from raytracingpbr_tpu.models import cornell
    from raytracingpbr_tpu.ops import integrator as integ
    from raytracingpbr_tpu.pallas.march_kernel import TILE, march_pallas

    scene = cornell.full_scene()
    cfg = cornell.full_config().replace(samples_per_frame=4,
                                        max_raytrace=512,
                                        quality_per_sample=0.8)
    cam = cornell.full_camera()
    env = cornell.sky()
    state = make_frame_state(cfg.num_pixels)
    frame_fn = jax.jit(lambda st: integ.render_frame(scene, env, cam, st,
                                                     cfg))
    for _ in range(5):
        _, state = frame_fn(state)
    rays = state.rays
    out = march_pallas(scene, rays.origin, rays.direction, cfg)
    need = np.asarray(out[3])
    np.save(CACHE, need)
    print(f"dumped needs {need.shape} to {CACHE}", flush=True)

n = need.shape[0] - (need.shape[0] % TILE)
need = need[:n].astype(np.int64)
need = np.maximum(need, 1)
tiles = n // TILE
CHUNK = 32
rng = np.random.default_rng(0)
print(f"lanes={n} tiles={tiles} need: p50={np.percentile(need,50):.0f} "
      f"p90={np.percentile(need,90):.0f} p99={np.percentile(need,99):.0f} "
      f"max={need.max()}", flush=True)

base_exec = (np.ceil(need.reshape(tiles, TILE).max(1) / CHUNK)
             * CHUNK).sum() * TILE
print(f"single-shot executed/needed = {base_exec/need.sum():.2f}x "
      f"({base_exec/1e6:.1f}M / {need.sum()/1e6:.1f}M)", flush=True)

for B in (32, 64, 128, 256, 512):
    r = need.copy()
    executed = 0.0
    consumed_total = 0.0
    STEPS = 60
    for s in range(STEPS):
        rt = r.reshape(tiles, TILE)
        trips = np.ceil(np.minimum(rt.max(1), B) / CHUNK) * CHUNK
        executed += trips.sum() * TILE
        consumed = np.minimum(rt, trips[:, None]).reshape(-1)
        consumed_total += consumed.sum()
        r = r - consumed
        done = r <= 0
        r[done] = rng.choice(need, size=int(done.sum()))
    segs_per_step = consumed_total / need.mean() / STEPS
    print(f"B={B:4d}: tax={executed/consumed_total:.2f}x  "
          f"executed/step={executed/STEPS/1e6:.2f}M  "
          f"segments-completed/step={segs_per_step/1e3:.0f}k "
          f"(lanes={n/1e3:.0f}k)", flush=True)
