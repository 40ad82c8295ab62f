import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from raytracingpbr_tpu.ops import ibl as ibllib
from raytracingpbr_tpu.ops import integrator as integ
from tests.test_nee import sun_env, sun_scene, CAM, base_cfg
env = sun_env(); env_s = ibllib.with_env_sampler(env)
scene = sun_scene()
cfg = base_cfg(max_raytrace=8)
kw = dict(roughness_fresnel=False, restart_at_hit=False, tonemapped=False, spp=256)
f_off = jax.jit(lambda s: integ.render_image(scene, env, CAM, cfg.replace(seed=s), **kw))
f_mis = jax.jit(lambda s: integ.render_image(scene, env_s, CAM, cfg.replace(env_sampling=True, seed=s), **kw))
offs = np.stack([np.asarray(f_off(s)) for s in range(40)])
miss = np.stack([np.asarray(f_mis(s)) for s in range(12)])
om = offs.mean(); mm = miss.mean()
ose = offs.reshape(40,-1).mean(1).std()/np.sqrt(40)
mse = miss.reshape(12,-1).mean(1).std()/np.sqrt(12)
print(f"plain {om:.5f} +- {ose:.5f}   mis {mm:.5f} +- {mse:.5f}   ratio {mm/om:.4f}")
