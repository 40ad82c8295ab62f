import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print('backend:', jax.default_backend(), flush=True)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ

scene = cornell.full_scene()
cfg = cornell.full_config().replace(samples_per_frame=4, max_raytrace=512,
                                    quality_per_sample=0.8)
cam = cornell.full_camera(); env = cornell.sky()
state = make_frame_state(cfg.num_pixels)
frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, cfg))

t0=time.time(); px, state = frame(state); jax.block_until_ready(px)
print('wavefront compile+first:', time.time()-t0, flush=True)
for _ in range(3):
    px, state = frame(state)
jax.block_until_ready(px)
c0 = float(state.accum[:,3].sum())
t0=time.time(); k=10
for _ in range(k):
    px, state = frame(state)
jax.block_until_ready(px)
dt = time.time()-t0
c1 = float(state.accum[:,3].sum())
print('wavefront: %.4f s/frame; deposits/s = %.3f M; steps/s=%.1f M' % (
    dt/k, (c1-c0)/dt/1e6, cfg.num_pixels*4*k/dt/1e6), flush=True)
