"""Split wavefront step cost: march vs shade vs rest; then render gallery."""
import time, os, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.ops import camera as cameralib, march as marchlib, scene as scenelib, shade as shadelib, integrator as integ
from raytracingpbr_tpu.models import cornell, bunny, demo
from raytracingpbr_tpu.io import image as imageio
from raytracingpbr_tpu.ops import post as postlib

scene = cornell.full_scene()
cfg = cornell.full_config().replace(samples_per_frame=4)
cam = cornell.full_camera(); env = cornell.sky()
n = cfg.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
u = rnglib.uniform4(pid, 0, 1, cfg.seed)
uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
rays = cameralib.get_ray(cam, uv, u[2], u[3])

def timeit(f, *a, k=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(k): out = f(*a)
    jax.block_until_ready(out)
    return (time.time()-t0)/k

# 1. march
m = jax.jit(lambda o, d: marchlib.march(scene, o, d, cfg, differentiable=False))
res = m(rays.origin, rays.direction)
print('march:', timeit(m, rays.origin, rays.direction), flush=True)

# 2. normals only
nm = jax.jit(lambda idx, p: scenelib.calc_normal(scene, idx, p))
print('calc_normal:', timeit(nm, res.index, res.position), flush=True)

# 3. full interaction
u4 = rnglib.uniform4(pid, 1, 2, cfg.seed)
sh = jax.jit(lambda idx, p, d: shadelib.ray_surface_interaction(scene, idx, p, d, u4, cfg))
print('interaction(incl normal):', timeit(sh, res.index, res.position, rays.direction), flush=True)

# 4. sky
sky = jax.jit(lambda d: rt.render_image.__globals__ and None)  # skip
from raytracingpbr_tpu.ops.ibl import sky_color
skyf = jax.jit(lambda d: sky_color(env, d))
print('sky(black):', timeit(skyf, rays.direction), flush=True)

# 5. full wavefront step alone
ws = jax.jit(lambda r, a: integ.wavefront_step(scene, env, cam, r, a, pid, jnp.uint32(0), cfg))
acc0 = jnp.zeros((n, 4))
print('wavefront_step:', timeit(ws, rays, acc0), flush=True)

# ---- gallery ----
os.makedirs('gallery', exist_ok=True)

def save(img, name):
    imageio.write_png(f'gallery/{name}.png', np.asarray(img))
    print('saved', name, flush=True)

# cornell (reuse parity output at full res if exists)
# bunny glass 480x270, 64 spp, frame 30
bs = bunny.animated_scene(bunny.glass_scene(), 30)
bcfg = bunny.glass_config(scale=4).replace(max_raymarch=512, max_raytrace=64)
bcam = bunny.camera(bcfg.width / bcfg.height)
benv = bunny.glass_environment()
f = jax.jit(lambda s: rt.render_image(bs, benv, bcam, bcfg, spp=8, sample_offset=s, tonemapped=False))
acc = None
for k in range(8):
    img = f(jnp.uint32(k*8)); acc = img if acc is None else acc+img
save(postlib.tonemap(acc/8, bcfg, 1.0), 'bunny_glass_f30')

# demo engine scene with synthetic HDR IBL
dcfg = demo.engine_config().replace(resolution=(768, 432), max_raytrace=64)
ds, denv, dcam = demo.engine_scene(), demo.engine_environment(), demo.engine_camera()
f2 = jax.jit(lambda s: rt.render_image(ds, denv, dcam, dcfg, spp=8, sample_offset=s, tonemapped=False))
acc = None
for k in range(8):
    img = f2(jnp.uint32(k*8)); acc = img if acc is None else acc+img
save(postlib.tonemap(acc/8, dcfg, 1.0), 'engine_ibl')

# scene demo with gradient sky
gcfg = demo.scene_demo_config().replace(resolution=(768, 432), max_raytrace=64)
gs, genv = demo.scene_demo_scene(), demo.gradient_environment()
f3 = jax.jit(lambda s: rt.render_image(gs, genv, dcam, gcfg, spp=8, sample_offset=s, tonemapped=False))
acc = None
for k in range(8):
    img = f3(jnp.uint32(k*8)); acc = img if acc is None else acc+img
save(postlib.tonemap(acc/8, gcfg, 1.0), 'scene_demo_gradient')
