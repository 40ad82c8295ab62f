import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from raytracingpbr_tpu.ops import shade as shadelib
from raytracingpbr_tpu.core import rng as rnglib
from tests.test_nee import sun_scene, base_cfg
scene = sun_scene(); cfg = base_cfg()
n = 2_000_000
for dvec in ([0.6,-0.7,0.2],[0.98,-0.1,0.05],[0.2,-0.97,0.1]):
    d = np.array(dvec,np.float32); d/=np.linalg.norm(d)
    normal = jnp.asarray(np.tile([[0.,1.,0.]],(n,1)),jnp.float32)
    pos = jnp.asarray(np.tile([[0.,1.,0.]],(n,1)),jnp.float32)
    direction = jnp.asarray(np.tile(d[None],(n,1)),jnp.float32)
    idx = jnp.ones((n,),jnp.int32)
    u = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 0, 7, 1)
    inter = shadelib.ray_surface_interaction(scene, idx, pos, direction, u, cfg,
                                             roughness_fresnel=False, reflect_kill=False)
    sel = np.asarray(inter.reflect)
    wd = np.asarray(inter.direction)
    rng = np.random.default_rng(1)
    z = rng.uniform(-1,1,n).astype(np.float32); phi = rng.uniform(0,2*np.pi,n).astype(np.float32)
    r = np.sqrt(np.maximum(1-z*z,0))
    wu = jnp.asarray(np.stack([r*np.cos(phi), z, r*np.sin(phi)],-1))
    ps = np.asarray(shadelib.specular_env_density(scene, idx, direction, normal,
            jnp.ones((n,),bool), wu, cfg, roughness_fresnel=False, reflect_kill=False))
    print("i=",dvec, "emp total", round(float(sel.mean()),4), "ana total", round(float(ps.mean()*4*np.pi),4))
