"""Identify the reference golden's generating variant (VERDICT r4 item 4).

``/root/reference/others/cornell_box_taichi.png`` is the reference's only
published acceptance artifact; r4's best match (v1 megakernel recipe at
512x512) scored PSNR 16 dB. The golden is 512x512 — but the v1 megakernel
renders 480x480 (``cornell_box.py:6``); the variants that natively render
512x512 are cornell_box_v2 and cornell_box_v3 (``cornell_box_v2.py:7``,
``cornell_box_v3/config.py:3``) plus the minimal box. This grid renders
every candidate the framework parameterizes, converged, and scores each
against the golden with BOTH tonemap orderings and a fine post-hoc
exposure sweep (the linear accumulation makes exposure/order free to
sweep after the fact).

Axes:
  * generation: v1 (480-box recipe at its own 480x480 then compared
    upscaled is hopeless — rendered at 512 here like r4 did), v2 (10x
    world), v3 (relative-err march), minimal (diffuse-only)
  * v1 shading toggles: f0_half x reflect_kill x restart_at_hit
  * box_round: 0.0 / 0.01 / 0.03 (src vs v2/v3 vs src-engine radius)
  * post-hoc: tonemap order x exposure in [0.2, 3.0] (48 points)

Output: ranked table (PSNR / SSIM / block-corr at each variant's best
exposure+order); best image written to out_anchor_best.png.
Run on TPU: python tools/anchor_grid.py [spp_passes]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.config import Tonemap
from raytracingpbr_tpu.io import image as io
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import post as postlib
from raytracingpbr_tpu.ops.scene import ObjectSpec, make_scene
from raytracingpbr_tpu.ops.sdf import SHAPE
from raytracingpbr_tpu.utils.metrics import block_corr, psnr, ssim

PASSES = int(_sys.argv[1]) if len(_sys.argv) > 1 else 64  # x8 spp each
GOLD = io.read_png("/root/reference/others/cornell_box_taichi.png")[..., :3] \
    .astype(np.float32) / 255.0
RES = (512, 512)

print(f"golden {GOLD.shape}, rendering {PASSES * 8} spp per variant",
      flush=True)


def rescene(box_round):
    # box_round is a static Scene field (ops/scene.py:70)
    return cornell.full_scene().replace(box_round=float(box_round))


def render_linear(scene, env, cam, cfg, spp_passes, **kw):
    f = jax.jit(lambda s: rt.render_image(scene, env, cam, cfg, spp=8,
                                          sample_offset=s, tonemapped=False,
                                          **kw))
    acc = None
    for k in range(spp_passes):
        img = f(jnp.uint32(k * 8))
        acc = img if acc is None else acc + img
    return np.asarray(acc / spp_passes)


def score(lin, cfg):
    """Best (psnr, ssim, bc, exposure, order) over the post-hoc axes."""
    best = None
    for order in (Tonemap.ACES_THEN_GAMMA, Tonemap.GAMMA_THEN_ACES):
        c = cfg.replace(tonemap=order)
        for e in np.geomspace(0.2, 3.0, 48):
            img = np.asarray(postlib.tonemap(jnp.asarray(lin), c, float(e)))
            db = psnr(img, GOLD)
            if best is None or db > best[0]:
                best = (db, img, float(e), order.value)
    db, img, e, order = best
    return dict(psnr=db, ssim=ssim(img, GOLD), bc=block_corr(img, GOLD),
                exposure=e, order=order, img=img)


results = []
env = cornell.sky()


def add(name, lin, cfg):
    s = score(lin, cfg)
    results.append((name, s))
    print(f"{name:58s} PSNR {s['psnr']:6.2f}  SSIM {s['ssim']:.4f}  "
          f"bc {s['bc']:.4f}  exp {s['exposure']:.2f} {s['order']}",
          flush=True)


# --- v2 and v3: the native-512 generations ---
v2cam = rt.make_camera(lookfrom=(0, 0, 30), lookat=(0, 0, 20), vfov=43.6,
                       aspect=1.0, aperture=0.1, focus=40.0)
t0 = time.time()
cfg2 = cornell.v2_config().replace(resolution=RES)
add("v2 (10x, rt=3)", render_linear(cornell.v2_scene(), env, v2cam, cfg2,
                                    PASSES), cfg2)
cfg2b = cfg2.replace(max_raytrace=128)
add("v2 scene, rt=128", render_linear(cornell.v2_scene(), env, v2cam, cfg2b,
                                      PASSES), cfg2b)
cfg3 = cornell.v3_config().replace(resolution=RES)
add("v3 (rel-err march)", render_linear(cornell.full_scene(), env,
                                        cornell.full_camera(), cfg3,
                                        PASSES), cfg3)
cfgm = cornell.minimal_config().replace(resolution=RES)
add("minimal (diffuse-only)", render_linear(cornell.minimal_scene(), env,
                                            cornell.minimal_camera(), cfgm,
                                            PASSES, diffuse_only=True),
    cfgm)

# --- v1 recipe at 512x512 with the shading/geometry toggles ---
for box_round in (0.0, 0.01, 0.03):
    scene = rescene(box_round)
    for f0_half in (True, False):
        for reflect_kill in (None, False):
            for restart in (True, False):
                cfg = cornell.full_config().replace(
                    resolution=RES, f0_half=f0_half)
                name = (f"v1 br={box_round} f0h={int(f0_half)} "
                        f"rk={reflect_kill} rs={int(restart)}")
                lin = render_linear(scene, env, cornell.full_camera(), cfg,
                                    PASSES, reflect_kill=reflect_kill,
                                    restart_at_hit=restart)
                add(name, lin, cfg)

print(f"\ntotal {time.time()-t0:.0f}s; ranked:", flush=True)
results.sort(key=lambda kv: -kv[1]["psnr"])
for name, s in results[:12]:
    print(f"{name:58s} PSNR {s['psnr']:6.2f}  SSIM {s['ssim']:.4f}  "
          f"bc {s['bc']:.4f}  exp {s['exposure']:.2f} {s['order']}")
io.write_png("/root/repo/out_anchor_best.png",
             results[0][1]["img"])
print("best ->", results[0][0], "| out_anchor_best.png", flush=True)
