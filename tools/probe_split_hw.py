"""Hardware A/B of the budget-capped split march (cfg.march_split).

The decisive measurement for VERDICT r4 item 2: wavefront frame throughput
on cornell full-PBR at the bench config, march_split in
{None, 32, 64, 128}. The simulation (tools/probe_split_budget.py) predicts
executed lane-iters/step dropping 13.1x -> 2.0x tax at budget 32 with 90%
of segments still completing per step. This probe measures real
Msamples/s (deposits/s) on the chip — the number that decides the default.
Run: python tools/probe_split_hw.py [budgets...]
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

from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ

print("backend:", jax.default_backend(), flush=True)
np.asarray(jnp.ones((8,)) * 2.0)

scene = cornell.full_scene()
cam = cornell.full_camera()
env = cornell.sky()
base = cornell.full_config().replace(samples_per_frame=4, max_raytrace=512,
                                     quality_per_sample=0.8)

budgets = [None if a == "none" else int(a) for a in _sys.argv[1:]] or \
    [None, 32, 64, 128]
for budget in budgets:
    cfg = base.replace(march_split=budget)
    frame = jax.jit(lambda st, cfg=cfg: integ.render_frame(
        scene, env, cam, st, cfg))
    state = make_frame_state(cfg.num_pixels)
    t0 = time.time()
    px, state = frame(state)
    jax.block_until_ready(px)
    tc = time.time() - t0
    for _ in range(6):
        px, state = frame(state)
    jax.block_until_ready(px)
    c0 = float(state.accum[:, 3].sum())
    k = 15
    t0 = time.time()
    for _ in range(k):
        px, state = frame(state)
    jax.block_until_ready(px)
    dt = time.time() - t0
    c1 = float(state.accum[:, 3].sum())
    infl = float((np.asarray(state.march_cum) > 0).mean()) if budget else 0.0
    print(f"march_split={str(budget):>4s}: {dt/k*1e3:6.2f} ms/frame, "
          f"{(c1-c0)/dt/1e6:7.3f} Msps  (compile {tc:.0f}s, "
          f"in-flight {infl*100:.0f}%)", flush=True)

# finer chunk granularity: budget floor is the chunk size, so B=32/chunk=32
# is one convergence check per step — sweep chunk 16 x budget {16, 32}
for chunk, budget in ((16, 16), (16, 32), (8, 16)):
    cfg = base.replace(march_split=budget, march_chunk=chunk)
    frame = jax.jit(lambda st, cfg=cfg: integ.render_frame(
        scene, env, cam, st, cfg))
    state = make_frame_state(cfg.num_pixels)
    px, state = frame(state)
    jax.block_until_ready(px)
    for _ in range(6):
        px, state = frame(state)
    jax.block_until_ready(px)
    c0 = float(state.accum[:, 3].sum())
    k = 15
    t0 = time.time()
    for _ in range(k):
        px, state = frame(state)
    jax.block_until_ready(px)
    dt = time.time() - t0
    c1 = float(state.accum[:, 3].sum())
    print(f"chunk={chunk} split={budget}: {dt/k*1e3:6.2f} ms/frame, "
          f"{(c1-c0)/dt/1e6:7.3f} Msps", flush=True)
