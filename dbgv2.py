import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from raytracingpbr_tpu.ops import shade as shadelib
from raytracingpbr_tpu.ops import march as marchlib
from raytracingpbr_tpu.ops import ibl as ibllib
from raytracingpbr_tpu.ops.ibl import sample_env_baked, sky_color, env_pdf
from raytracingpbr_tpu.core import rng as rnglib
from tests.test_nee import sun_env, sun_scene, base_cfg

scene = sun_scene(); cfg = base_cfg(max_raytrace=2)
env = ibllib.with_env_sampler(sun_env())
n = 2_000_000

def vertex_check(pos_np, d_np, label, idx_obj=1):
    d = np.asarray(d_np, np.float32); d /= np.linalg.norm(d)
    pos_np = np.asarray(pos_np, np.float32)
    pos = jnp.asarray(np.tile(pos_np[None],(n,1)))
    direction = jnp.asarray(np.tile(d[None],(n,1)))
    idx = jnp.full((n,), idx_obj, jnp.int32)
    u = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 0, 7, 1)
    inter = shadelib.ray_surface_interaction(scene, idx, pos, direction, u, cfg,
                                             roughness_fresnel=False, restart_at_hit=False)
    normal = inter.normal  # true faced normal at the vertex
    refl = np.asarray(inter.reflect)
    res = marchlib.march(scene, inter.origin, inter.direction, cfg, differentiable=False)
    miss = ~np.asarray(res.hit)
    sky = np.asarray(sky_color(env, inter.direction)).mean(-1)
    ps_b = shadelib.specular_env_density(scene, idx, direction, normal, inter.outer,
            inter.direction, cfg, roughness_fresnel=False)
    w_b = np.asarray(ps_b/jnp.maximum(env_pdf(env, inter.direction)+ps_b,1e-20))
    plain = (sky*miss*refl).mean()
    cont  = (sky*w_b*miss*refl).mean()
    u2 = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 1, 3, 1)
    d_l, L, pe = sample_env_baked(env, u2[0], u2[1], u_jitter=(u2[2], u2[3]))
    cos = np.asarray(jnp.sum(d_l*normal,-1))
    origin_s = pos + normal*cfg.min_dis
    vres = marchlib.march(scene, origin_s, d_l, cfg.replace(escape_bound=True),
                          differentiable=False, active=jnp.asarray(cos>0))
    V = (cos>0) & ~np.asarray(vres.hit)
    ps_l = np.asarray(shadelib.specular_env_density(scene, idx, direction, normal,
            inter.outer, d_l, cfg, roughness_fresnel=False))
    bank = (np.asarray(L).mean(-1)*V*ps_l/(np.maximum(np.asarray(pe),1e-12)+ps_l)).mean()
    print(f"{label}: plain {plain:.5f} cont {cont:.5f} bank {bank:.5f} ratio {(cont+bank)/max(plain,1e-9):.4f}")

vertex_check([0,1,0],[0.6,-0.7,0.2],"pole oblique")
vertex_check([0,1,0],[0.98,-0.1,0.05],"pole grazing")
s3 = 1/np.sqrt(3)
vertex_check([s3,s3,s3],[0.0,-0.2,-0.98],"sphere side")
vertex_check([0.8,-0.96,0.5],[0.3,-0.5,0.2],"ground pt", idx_obj=0)
