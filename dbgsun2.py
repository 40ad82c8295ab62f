import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from raytracingpbr_tpu.ops import shade as shadelib
from raytracingpbr_tpu.core import rng as rnglib
from tests.test_nee import sun_scene, base_cfg
scene = sun_scene(); cfg = base_cfg()
n = 8_000_000
d = np.array([0.6,-0.7,0.2],np.float32); d/=np.linalg.norm(d)
normal1 = np.array([0.,1.,0.],np.float32)
# sun texels: x in 8..11, y in 11..14 on 32x16
dirs = []
for x in range(8,12):
    for y in range(11,15):
        uu=(x+0.5)/32; vv=(y+0.5)/16
        phi=(uu-0.5)*2*np.pi; lat=(vv-0.5)*np.pi
        cl=np.cos(lat)
        dirs.append([cl*np.cos(phi), np.sin(lat), cl*np.sin(phi)])
dirs = np.asarray(dirs, np.float32)
m_=len(dirs)
ps = np.asarray(shadelib.specular_env_density(scene, jnp.ones((m_,),jnp.int32),
     jnp.asarray(np.tile(d[None],(m_,1))), jnp.asarray(np.tile(normal1[None],(m_,1))),
     jnp.ones((m_,),bool), jnp.asarray(dirs), cfg, roughness_fresnel=False))
# empirical via simulation caps
normal = jnp.asarray(np.tile(normal1[None],(n,1)))
pos = normal
direction = jnp.asarray(np.tile(d[None],(n,1)))
u = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 0, 7, 1)
inter = shadelib.ray_surface_interaction(scene, jnp.ones((n,),jnp.int32), pos, direction, u, cfg,
                                         roughness_fresnel=False, reflect_kill=False)
sel = np.asarray(inter.reflect); wd = np.asarray(inter.direction)
cosc=0.993; cap=2*np.pi*(1-cosc)
for k in range(m_):
    cnt = ((wd@dirs[k] > cosc) & sel).sum()
    print(f"texel {k} dir {dirs[k].round(2)} emp {cnt/n/cap:.5f} ana {ps[k]:.5f}")
