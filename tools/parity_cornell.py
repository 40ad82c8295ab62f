"""Render cornell full-PBR (converged) and compare against the reference
golden (others/cornell_box_taichi.png): accumulate LINEAR radiance, tonemap
once at the end."""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import raytracingpbr_tpu as rt
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.io import image as io
from raytracingpbr_tpu.ops import post as postlib

scene = cornell.full_scene()
cfg = cornell.full_config().replace(resolution=(512, 512))
cam = cornell.full_camera(); env = cornell.sky()

# NOTE: must be the megakernel estimator — the golden was rendered by the
# example megakernel (roughness Fresnel + restart-at-hit + EXP roulette);
# the wavefront's src/-engine shading variants measurably change block
# structure (corr 0.83 vs 0.95; see PARITY.md "deliberate divergences").
f = jax.jit(lambda s: rt.render_image(scene, env, cam, cfg, spp=8, sample_offset=s,
                                      tonemapped=False))
acc = None
t0 = time.time()
K = 96  # 768 spp
for k in range(K):
    img = f(jnp.uint32(k * 8))
    acc = img if acc is None else acc + img
lin = np.asarray(acc / K)
print(f'render {K*8}spp took', time.time()-t0, 'linear mean', lin.mean(), flush=True)
# exposure 1.0 maximizes block-mean agreement with the golden
# (sweep 2026-08-19: corr 0.960 / mean-diff 0.054 at 1.0 vs
#  0.951 / 0.119 at the round-1 guess 0.6)
img = np.asarray(postlib.tonemap(jnp.asarray(lin), cfg, 1.0))
io.write_png('/root/repo/out_parity_cornell.png', img)

gold = io.read_png('/root/reference/others/cornell_box_taichi.png')[..., :3] / 255.0
print('ours mean', img.mean(), 'gold mean', gold.mean())
def blocks(a, k=16):
    h, w = a.shape[:2]
    return a[:h//k*k, :w//k*k].reshape(k, h//k, k, w//k, 3).mean((1, 3))
ob, gb = blocks(img), blocks(gold)
print('block corr', np.corrcoef(ob.ravel(), gb.ravel())[0, 1])
print('block mean abs diff', np.abs(ob - gb).mean())
