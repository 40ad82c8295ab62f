"""Render cornell full-PBR and compare against the reference golden
(others/cornell_box_taichi.png) — structural parity metrics."""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.io import image as io

scene = cornell.full_scene()
cfg = cornell.full_config().replace(resolution=(512, 512))
cam = cornell.full_camera(); env = cornell.sky()

f = jax.jit(lambda s: rt.render_image(scene, env, cam, cfg, spp=8, sample_offset=s,
                                      exposure=0.6))
acc = None
t0 = time.time()
for k in range(8):
    img = f(jnp.uint32(k * 8))
    acc = img if acc is None else acc + img
img = np.asarray(acc / 8)
print('render 64spp took', time.time()-t0, flush=True)
io.write_png('/root/repo/out_parity_cornell.png', img)

gold = io.read_png('/root/reference/others/cornell_box_taichi.png')[..., :3] / 255.0
print('ours mean', img.mean(), 'gold mean', gold.mean())
def blocks(a, k=16):
    h, w = a.shape[:2]
    return a[:h//k*k, :w//k*k].reshape(k, h//k, k, w//k, 3).mean((1, 3))
ob, gb = blocks(img), blocks(gold)
print('block corr', np.corrcoef(ob.ravel(), gb.ravel())[0, 1])
print('block mean abs diff', np.abs(ob - gb).mean())
