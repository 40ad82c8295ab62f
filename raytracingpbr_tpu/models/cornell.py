"""Cornell-box scene family.

Reference workloads (SURVEY.md §2.2, §6):
* ``minimal``  — ``examples/cornell_box/cornell_box_shortest.py`` (512x512,
  3 bounces, diffuse-only, sharp boxes, area light emission=100).
* ``full``     — ``examples/cornell_box/cornell_box.py`` (480x480, full
  6-param PBR material, 128 bounces, black sky).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import HitCriterion, OmegaPolicy, RenderConfig, Roulette, Tonemap
from ..core.types import Camera, make_camera
from ..ops.ibl import Environment, black_sky
from ..ops.scene import ObjectSpec, Scene, make_scene
from ..ops.sdf import SHAPE

# Shared cornell geometry: 5 walls + 2 boxes + area light. Values from
# cornell_box_shortest.py:16-32 (full-PBR variant differs only in the taller
# box's rotation, cornell_box.py:181: -253 vs 112 degrees — see `full_scene`).
_WALLS = [
    # (position, rotation, scale, albedo)
    (((0, 0, -1), (0, 0, 0), (1, 1, 0.2), (0.4, 0.4, 0.4))),      # back
    (((0, 1, 0), (90, 0, 0), (1, 1, 0.2), (0.4, 0.4, 0.4))),      # ceiling
    (((0, -1, 0), (90, 0, 0), (1, 1, 0.2), (0.4, 0.4, 0.4))),     # floor
    (((-1, 0, 0), (0, 90, 0), (1, 1, 0.2), (0.5, 0.0, 0.0))),     # left red
    (((1, 0, 0), (0, 90, 0), (1, 1, 0.2), (0.0, 0.5, 0.0))),      # right green
]
_TALL_BOX = ((-0.275, -0.3, -0.2), (0.25, 0.5, 0.25))
_SMALL_BOX = (((0.275, -0.55, 0.2), (0, -197, 0), (0.25, 0.25, 0.25)))
_LIGHT = (((0, 0.809, 0), (90, 0, 0), (0.2, 0.2, 0.01)))


def minimal_scene() -> Scene:
    """8 sharp boxes; albedo+emission-only materials
    (``cornell_box_shortest.py:11,16-32``)."""
    objs = []
    for pos, rot, scale, alb in _WALLS:
        objs.append(ObjectSpec(SHAPE.BOX, pos, rot, scale, albedo=alb))
    objs.append(ObjectSpec(SHAPE.BOX, _TALL_BOX[0], (0, 112, 0), _TALL_BOX[1],
                           albedo=(0.4, 0.4, 0.4)))
    objs.append(ObjectSpec(SHAPE.BOX, _SMALL_BOX[0], _SMALL_BOX[1],
                           _SMALL_BOX[2], albedo=(0.4, 0.4, 0.4)))
    objs.append(ObjectSpec(SHAPE.BOX, _LIGHT[0], _LIGHT[1], _LIGHT[2],
                           albedo=(1.0, 1.0, 1.0),
                           emission=(100.0, 100.0, 100.0)))
    return make_scene(objs, box_round=0.0)


def minimal_config() -> RenderConfig:
    """512x512, 3 bounces, 256 basic-march steps, absolute hit test
    (``cornell_box_shortest.py:4,6,63-72,83``)."""
    return RenderConfig(
        resolution=(512, 512),
        max_raytrace=3,
        max_raymarch=256,
        omega=1.0,
        omega_policy=OmegaPolicy.CONSTANT,
        hit_criterion=HitCriterion.ABSOLUTE,
        hit_precision=1e-5,
        march_t0=0.0005,
        max_dis=2000.0,
        roulette=Roulette.EXP,
        light_quality=128.0,
        tonemap=Tonemap.GAMMA_THEN_ACES,  # shortest: gamma, then ACES (:125-128)
        visibility=(1e-6, 1e32),
    )


def minimal_camera() -> Camera:
    """Fixed camera at z=3.5 looking at origin, vfov 35, no lens
    (``cornell_box_shortest.py:105-116,132``)."""
    return make_camera(lookfrom=(0.0, 0.0, 3.5), lookat=(0.0, 0.0, -1.0),
                       vfov=35.0, aspect=1.0, aperture=0.0, focus=1.0)


def full_scene() -> Scene:
    """Full 6-param PBR material cornell box (``cornell_box.py:161-193``):
    rough dielectric walls (ior 1.53), light emission=100."""
    mat = dict(roughness=1.0, metallic=0.0, transmission=0.0, ior=1.53)
    objs = []
    for pos, rot, scale, alb in _WALLS:
        objs.append(ObjectSpec(SHAPE.BOX, pos, rot, scale, albedo=alb, **mat))
    objs.append(ObjectSpec(SHAPE.BOX, _TALL_BOX[0], (0, -253, 0),
                           _TALL_BOX[1], albedo=(0.4, 0.4, 0.4), **mat))
    objs.append(ObjectSpec(SHAPE.BOX, _SMALL_BOX[0], _SMALL_BOX[1],
                           _SMALL_BOX[2], albedo=(0.4, 0.4, 0.4), **mat))
    objs.append(ObjectSpec(SHAPE.BOX, _LIGHT[0], _LIGHT[1], _LIGHT[2],
                           albedo=(1.0, 1.0, 1.0),
                           emission=(100.0, 100.0, 100.0),
                           roughness=1.0, ior=1.0))
    return make_scene(objs, box_round=0.0)


def full_config() -> RenderConfig:
    """480x480, 128 bounces / 512 march, absolute precision 1e-4, w=1
    (``cornell_box.py:6-7,14-20``)."""
    return RenderConfig(
        resolution=(480, 480),
        max_raytrace=128,
        max_raymarch=512,
        omega=1.0,
        omega_policy=OmegaPolicy.CONSTANT,
        hit_criterion=HitCriterion.ABSOLUTE,
        hit_precision=1e-4,
        march_t0=0.005,
        max_dis=2000.0,
        roulette=Roulette.EXP,
        light_quality=128.0,
        tonemap=Tonemap.ACES_THEN_GAMMA,
        visibility=(1e-6, 1e32),
        f0_half=True,  # cornell_box.py:275 F0 variant (config.f0_half)
    )


def full_camera() -> Camera:
    """Live-app camera defaults (``cornell_box.py:30-35,381-384``)."""
    return make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 2.0),
                       vfov=43.6, aspect=1.0, aperture=0.01, focus=4.0)


def v2_scene() -> Scene:
    """Cornell v2 (``cornell_box_v2.py:130-140``): box-only SDF at 10x world
    scale with a 0.01 round radius."""
    objs = []
    s10 = lambda v: tuple(10 * x for x in v)
    for pos, rot, scale, alb in _WALLS:
        objs.append(ObjectSpec(SHAPE.BOX, s10(pos), rot, s10(scale),
                               albedo=alb, roughness=1.0, ior=1.53))
    objs.append(ObjectSpec(SHAPE.BOX, s10(_TALL_BOX[0]), (0, -253, 0),
                           s10(_TALL_BOX[1]), albedo=(0.4, 0.4, 0.4),
                           roughness=1.0, ior=1.53))
    objs.append(ObjectSpec(SHAPE.BOX, s10(_SMALL_BOX[0]), _SMALL_BOX[1],
                           s10(_SMALL_BOX[2]), albedo=(0.4, 0.4, 0.4),
                           roughness=1.0, ior=1.53))
    objs.append(ObjectSpec(SHAPE.BOX, s10(_LIGHT[0]), _LIGHT[1],
                           s10(_LIGHT[2]), albedo=(1.0, 1.0, 1.0),
                           emission=(100.0, 100.0, 100.0), roughness=1.0,
                           ior=1.0))
    return make_scene(objs, box_round=0.01)


def v2_config() -> RenderConfig:
    """v2: MAX_RAYTRACE=3 at 10x scale (``cornell_box_v2.py:22``)."""
    return full_config().replace(max_raytrace=3, max_dis=20000.0,
                                 march_t0=0.05, hit_precision=1e-3)


def v3_config() -> RenderConfig:
    """Cornell v3's modular engine config: relative-error hit criterion with
    the w=1.6 -> 1.0 rollback (``cornell_box_v3/pathtracer.py:52-78``)."""
    from ..config import HitCriterion, OmegaPolicy
    return full_config().replace(
        omega=1.6, omega_policy=OmegaPolicy.ROLLBACK_TO_ONE,
        hit_criterion=HitCriterion.RELATIVE, march_t0=0.005)


def sky() -> Environment:
    """Cornell megakernels use a black sky (``cornell_box.py:232-234``)."""
    return black_sky()
