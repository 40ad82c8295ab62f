import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from raytracingpbr_tpu.ops import shade as shadelib
from raytracingpbr_tpu.core import rng as rnglib
from tests.test_nee import sun_scene, base_cfg
scene = sun_scene(); cfg = base_cfg()
n = 4_000_000
d = np.array([0.6,-0.7,0.2],np.float32); d/=np.linalg.norm(d)
normal = jnp.asarray(np.tile([[0.,1.,0.]],(n,1)),jnp.float32)
pos = jnp.asarray(np.tile([[0.,1.,0.]],(n,1)),jnp.float32)
direction = jnp.asarray(np.tile(d[None],(n,1)),jnp.float32)
idx = jnp.ones((n,),jnp.int32)
u = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 0, 7, 1)
inter = shadelib.ray_surface_interaction(scene, idx, pos, direction, u, cfg,
                                         roughness_fresnel=False, reflect_kill=False)
sel = np.asarray(inter.reflect); wd = np.asarray(inter.direction)
sun = np.array([0.237,0.77,-0.595],np.float32); sun/=np.linalg.norm(sun)
for cosc in (0.98, 0.995):
    cap_sa = 2*np.pi*(1-cosc)
    cnt = ((wd@sun > cosc) & sel).sum()
    ps = shadelib.specular_env_density(scene, idx[:1], jnp.asarray(d[None]), normal[:1],
         jnp.ones((1,),bool), jnp.asarray(sun[None]), cfg, roughness_fresnel=False)
    print(f"cap {cosc}: emp {cnt/n/cap_sa:.5f} ana {float(ps[0]):.5f}")
