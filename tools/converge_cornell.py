import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ

scene = cornell.full_scene()
cfg = cornell.full_config().replace(resolution=(128,128))
cam = cornell.full_camera(); env = cornell.sky()

f = jax.jit(lambda s: rt.render_image(scene, env, cam, cfg, spp=16, sample_offset=s, tonemapped=False))
acc = None
for k in range(24):  # 384 spp
    img = f(jnp.uint32(k*16))
    acc = img if acc is None else acc + img
lin = np.asarray(acc/24)
print('mega linear mean', lin.mean(), 'p50', np.percentile(lin,50), flush=True)
from raytracingpbr_tpu.ops import post as postlib
tm = np.asarray(postlib.tonemap(jnp.asarray(lin), cfg, 0.6))
print('mega tonemapped mean', tm.mean(), flush=True)

# wavefront equilibrium
wcfg = cfg.replace(samples_per_frame=8)
state = make_frame_state(wcfg.num_pixels)
fr = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, wcfg, exposure=0.6))
for _ in range(200):
    px, state = fr(state)
acc2 = np.asarray(state.accum)
linw = acc2[:, :3] / acc2[:, 3:4]
print('wave linear mean', linw.mean(), 'mean spp', acc2[:,3].mean(), flush=True)
