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
d = np.array([0.6,-0.7,0.2],np.float32); d/=np.linalg.norm(d)
normal = jnp.asarray(np.tile([[0.,1.,0.]],(n,1)),jnp.float32)
pos = jnp.asarray(np.tile([[0.,1.,0.]],(n,1)),jnp.float32)
direction = jnp.asarray(np.tile(d[None],(n,1)),jnp.float32)
idx = jnp.ones((n,),jnp.int32)
u = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 0, 7, 1)
inter = shadelib.ray_surface_interaction(scene, idx, pos, direction, u, cfg,
                                         roughness_fresnel=False, restart_at_hit=False)
refl = np.asarray(inter.reflect)
# continuation: march, on miss realize sky
res = marchlib.march(scene, inter.origin, inter.direction, cfg, differentiable=False)
miss = ~np.asarray(res.hit)
sky = np.asarray(sky_color(env, inter.direction))
ps_b = shadelib.specular_env_density(scene, idx, direction, normal, inter.outer,
        inter.direction, cfg, roughness_fresnel=False)
pe_b = env_pdf(env, inter.direction)
w_b = np.asarray(ps_b/jnp.maximum(pe_b+ps_b,1e-20))
plain = (sky.mean(-1)*miss*refl).mean()
cont  = (sky.mean(-1)*w_b*miss*refl).mean()
# bank: env draw
u2 = rnglib.uniform4(jnp.arange(n,dtype=jnp.uint32), 1, 3, 1)
d_l, L, pe = sample_env_baked(env, u2[0], u2[1])
cos = np.asarray(jnp.sum(d_l*normal,-1))
origin_s = pos + normal*cfg.min_dis
vres = marchlib.march(scene, origin_s, d_l, cfg.replace(escape_bound=True), differentiable=False,
                      active=jnp.asarray(cos>0))
V = (cos>0) & ~np.asarray(vres.hit)
ps_l = np.asarray(shadelib.specular_env_density(scene, idx, direction, normal,
        jnp.ones((n,),bool), d_l, cfg, roughness_fresnel=False))
pe_l = np.asarray(pe)
bank = (np.asarray(L).mean(-1)*V*ps_l/(np.maximum(pe_l,1e-12)+ps_l)).mean()
print(f"plain {plain:.5f}  cont {cont:.5f} + bank {bank:.5f} = {cont+bank:.5f}  ratio {(cont+bank)/plain:.4f}")

Lmean = np.asarray(L).mean(-1)
skym = sky.mean(-1)
sun_b = Lmean > 1.0; sun_c = skym > 1.0
for name, mc, mb in (("sun", sun_c, sun_b), ("dim", ~sun_c, ~sun_b)):
    p_ = (skym*miss*refl*mc).mean()
    c_ = (skym*w_b*miss*refl*mc).mean()
    b_ = (Lmean*V*ps_l/(np.maximum(pe_l,1e-12)+ps_l)*mb).mean()
    print(f"{name}: plain {p_:.5f} cont {c_:.5f} bank {b_:.5f} mis {c_+b_:.5f} ratio {(c_+b_)/p_:.4f}")
