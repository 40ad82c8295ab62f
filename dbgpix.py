import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from raytracingpbr_tpu.ops import ibl as ibllib
from raytracingpbr_tpu.ops import integrator as integ
from tests.test_nee import sun_env, sun_scene, CAM, base_cfg
env = sun_env(); env_s = ibllib.with_env_sampler(env)
scene = sun_scene()
cfg = base_cfg(max_raytrace=2)
kw = dict(roughness_fresnel=False, restart_at_hit=False, tonemapped=False, spp=256)
K = 8
mis = np.zeros((12,12)); nom = np.zeros((12,12))
for s in range(K):
    mis += np.asarray(integ.render_image(scene, env_s, CAM, cfg.replace(env_sampling=True, seed=s), **kw)).mean(-1)/K
    nom += np.asarray(integ.render_image(scene, env_s, CAM, cfg.replace(env_sampling=True, mis_specular=False, seed=s), **kw)).mean(-1)/K
d = mis - nom
np.set_printoptions(precision=3, suppress=True, linewidth=200)
print("mis-nomis per pixel:"); print(d)
print("total", d.mean(), "nomis mean", nom.mean())
