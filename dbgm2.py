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
for s in range(4):
    off = np.asarray(integ.render_image(scene, env, CAM, cfg.replace(seed=s), **kw))
    on = np.asarray(integ.render_image(scene, env_s, CAM, cfg.replace(env_sampling=True, seed=s), **kw))
    on2 = np.asarray(integ.render_image(scene, env_s, CAM, cfg.replace(env_sampling=True, mis_specular=False, seed=s), **kw))
    print(f"seed {s}: off {off.mean():.4f} mis {on.mean():.4f} nomis {on2.mean():.4f}")
