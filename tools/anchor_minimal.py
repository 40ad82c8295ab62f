"""Converge the anchor-grid winner (VERDICT r4 item 4, stage 2).

tools/anchor_grid.py identified the MINIMAL (diffuse-only,
cornell_box_shortest.py) variant as the reference golden's generating
renderer: 18.8 dB / block-corr 0.972 at 384 spp — >3 dB above every
full-PBR variant, at the golden's native 512x512, with shortest's own
gamma-then-ACES order winning the tonemap axis. This stage re-renders it
converged (2048 spp) and sweeps exposure/gamma finely. Run on TPU.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.config import Tonemap
from raytracingpbr_tpu.io import image as io
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import post as postlib
from raytracingpbr_tpu.utils.metrics import block_corr, psnr, ssim

GOLD = io.read_png("/root/reference/others/cornell_box_taichi.png")[..., :3] \
    .astype(np.float32) / 255.0

cfg = cornell.minimal_config().replace(resolution=(512, 512))
scene = cornell.minimal_scene()
env = cornell.sky()
cam = cornell.minimal_camera()

PASSES = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256  # x8 spp
f = jax.jit(lambda s: rt.render_image(scene, env, cam, cfg, spp=8,
                                      sample_offset=s, tonemapped=False,
                                      diffuse_only=True))
acc = None
t0 = time.time()
for k in range(PASSES):
    img = f(jnp.uint32(k * 8))
    acc = img if acc is None else acc + img
lin = np.asarray(acc / PASSES)
print(f"{PASSES*8} spp in {time.time()-t0:.0f}s  linear mean {lin.mean():.4f}",
      flush=True)

best = None
for order in (Tonemap.GAMMA_THEN_ACES, Tonemap.ACES_THEN_GAMMA):
    for gamma in (2.2, 2.4):
        c = cfg.replace(tonemap=order, gamma=gamma)
        for e in np.geomspace(0.5, 2.4, 90):
            img = np.asarray(postlib.tonemap(jnp.asarray(lin), c, float(e)))
            db = psnr(img, GOLD)
            if best is None or db > best[0]:
                best = (db, img, float(e), order.value, gamma)
db, img, e, order, gamma = best
print(f"BEST: PSNR {db:.2f} dB  SSIM {ssim(img, GOLD):.4f}  "
      f"block-corr {block_corr(img, GOLD):.4f}  exp {e:.3f} {order} "
      f"gamma {gamma}", flush=True)
print(f"means: ours {img.mean():.4f} vs gold {GOLD.mean():.4f}", flush=True)
io.write_png("/root/repo/out_anchor_best.png", img)

# per-channel/spatial residual structure: is the rest shading or capture?
diff = img - GOLD
print("residual: mean", diff.mean(axis=(0, 1)),
      "| abs p50/p90:", np.percentile(np.abs(diff), [50, 90]), flush=True)

# Stage 3: is the residual a global color transform (capture cast) or
# shading? Fit per-channel gains on the linear image before the post
# chain; a large PSNR jump proves the remaining gap is not geometry or
# light transport.
c = cfg.replace(tonemap=Tonemap(order), gamma=gamma)
best2 = (db, (1.0, 1.0, 1.0), img)
for gr in np.linspace(0.7, 1.2, 11):
    for gg in np.linspace(0.7, 1.2, 11):
        for gb in np.linspace(0.7, 1.2, 11):
            lin2 = lin * np.asarray([gr, gg, gb], np.float32) * e
            img2 = np.asarray(postlib.tonemap(jnp.asarray(lin2), c, 1.0))
            d2 = psnr(img2, GOLD)
            if d2 > best2[0]:
                best2 = (d2, (gr, gg, gb), img2)
db2, gains, img2 = best2
print(f"per-channel gains {tuple(round(g,3) for g in gains)}: "
      f"PSNR {db2:.2f} dB  SSIM {ssim(img2, GOLD):.4f}  "
      f"block-corr {block_corr(img2, GOLD):.4f}", flush=True)
