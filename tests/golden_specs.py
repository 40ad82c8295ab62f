"""Self-golden render specs — one per reference workload family.

Shared by ``tools/make_goldens.py`` (writes ``assets/goldens/<name>.png``)
and ``tests/test_parity.py`` (re-renders and PSNR-gates against the
checked-in golden). Everything here is deterministic: counter RNG keyed on
(pixel_id, sample_index, cfg.seed), fixed sample_offset, CPU platform
(tests/conftest.py pins JAX_PLATFORMS=cpu), so a regression in any layer —
march, shade, IBL, camera, RNG, post — moves pixels and trips the gate.

Resolutions/budgets are scaled down from the reference configs so the whole
family sweep stays CI-affordable; the scene/material/tonemap *content* is
the per-family reference config (models/...), which is the conformance
surface (reference examples/: cornell_box*.py, bunny_sdf*.py, index.py,
src/scene.py scene_demo).
"""
from __future__ import annotations

import jax.numpy as jnp

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.models import bunny, cornell, demo


def _cornell_minimal():
    cfg = cornell.minimal_config().replace(resolution=(64, 64),
                                           max_raymarch=128, max_raytrace=8)
    return dict(scene=cornell.minimal_scene(), env=cornell.sky(),
                cam=cornell.minimal_camera(), cfg=cfg, spp=8, exposure=0.6)


def _cornell_full():
    cfg = cornell.full_config().replace(resolution=(64, 64),
                                        max_raymarch=160, max_raytrace=12)
    return dict(scene=cornell.full_scene(), env=cornell.sky(),
                cam=cornell.full_camera(), cfg=cfg, spp=8, exposure=0.6)


def _cornell_v2():
    cfg = cornell.v2_config().replace(resolution=(64, 64), max_raymarch=128)
    cam = rt.make_camera(lookfrom=(0, 0, 30), lookat=(0, 0, 20), vfov=43.6,
                         aspect=1.0, aperture=0.01, focus=4.0)
    return dict(scene=cornell.v2_scene(), env=cornell.sky(), cam=cam,
                cfg=cfg, spp=8, exposure=0.6)


def _cornell_v3():
    cfg = cornell.v3_config().replace(resolution=(64, 64),
                                      max_raymarch=128, max_raytrace=8)
    return dict(scene=cornell.full_scene(), env=cornell.sky(),
                cam=cornell.full_camera(), cfg=cfg, spp=8, exposure=0.6)


def _bunny_metal():
    cfg = bunny.metal_config(scale=40).replace(max_raymarch=128,
                                               max_raytrace=8)
    return dict(scene=bunny.metal_scene(), env=bunny.glass_environment(),
                cam=bunny.camera(cfg.width / cfg.height), cfg=cfg, spp=6)


def _bunny_v2():
    cfg = bunny.v2_config(scale=40).replace(max_raymarch=128, max_raytrace=8)
    return dict(scene=bunny.glass_scene(), env=bunny.v2_environment(),
                cam=bunny.camera(cfg.width / cfg.height), cfg=cfg, spp=6)


def _bunny_glass_anim():
    cfg = bunny.glass_config(scale=40).replace(max_raymarch=128,
                                               max_raytrace=8)
    scene = bunny.animated_scene(bunny.glass_scene(), jnp.asarray(12.0))
    return dict(scene=scene, env=bunny.glass_environment(),
                cam=bunny.camera(cfg.width / cfg.height), cfg=cfg, spp=6)


def _scene_demo():
    cfg = demo.scene_demo_config().replace(resolution=(64, 36),
                                           max_raymarch=128, max_raytrace=8)
    return dict(scene=demo.scene_demo_scene(), env=demo.gradient_environment(),
                cam=demo.engine_camera(), cfg=cfg, spp=6)


def _tokyo():
    cfg = demo.tokyo_config().replace(resolution=(64, 36),
                                      max_raymarch=128, max_raytrace=8)
    return dict(scene=demo.engine_scene(), env=demo.tokyo_environment(),
                cam=demo.engine_camera(), cfg=cfg, spp=6)


# name -> spec factory; every reference workload family with an image output
GOLDENS = {
    "cornell_minimal": _cornell_minimal,
    "cornell_full": _cornell_full,
    "cornell_v2": _cornell_v2,
    "cornell_v3": _cornell_v3,
    "bunny_metal": _bunny_metal,
    "bunny_v2": _bunny_v2,
    "bunny_glass_anim": _bunny_glass_anim,
    "scene_demo": _scene_demo,
    "tokyo": _tokyo,
}

# families additionally rendered through the wavefront integrator (the
# src/-engine estimator) so BOTH estimators are golden-gated
WAVEFRONT_GOLDENS = ("cornell_full", "scene_demo")


def render_golden(name: str):
    """Render a family's golden image (uint8-ready float in [0,1])."""
    spec = GOLDENS[name]()
    return rt.render_image(spec["scene"], spec["env"], spec["cam"],
                           spec["cfg"], spp=spec["spp"],
                           exposure=spec.get("exposure", 1.0))


def render_wavefront_golden(name: str):
    spec = GOLDENS[name]()
    img, _ = rt.render_image_progressive(
        spec["scene"], spec["env"], spec["cam"], spec["cfg"],
        spp=spec["spp"], exposure=spec.get("exposure", 1.0))
    return img
