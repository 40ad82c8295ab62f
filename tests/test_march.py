"""Sphere-trace march tests: hit accuracy per omega policy / hit criterion,
miss handling, implicit-function gradients (SURVEY.md §2.3.4, §7.4.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.config import HitCriterion, OmegaPolicy, RenderConfig
from raytracingpbr_tpu.ops import march as ml
from raytracingpbr_tpu.ops import scene as sc
from raytracingpbr_tpu.ops.scene import ObjectSpec
from raytracingpbr_tpu.ops.sdf import SHAPE


def sphere_scene(r=1.0):
    return sc.make_scene([ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0),
                                     scale=(r, r, r))])


def head_on_rays(n=4, z=5.0):
    o = jnp.tile(jnp.array([[0.0, 0.0, z]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    return o, d


CONFIGS = {
    "src_engine": RenderConfig(omega=1.6,
                               omega_policy=OmegaPolicy.ROLLBACK_TO_ONE,
                               hit_criterion=HitCriterion.CONE),
    "tokyo": RenderConfig(omega=1.6,
                          omega_policy=OmegaPolicy.ROLLBACK_HALF_UP,
                          hit_criterion=HitCriterion.RELATIVE,
                          march_t0=0.005),
    "glass": RenderConfig(omega=0.5, omega_policy=OmegaPolicy.CONSTANT,
                          hit_criterion=HitCriterion.RELATIVE,
                          march_t0=0.005),
    "shortest": RenderConfig(omega=1.0, omega_policy=OmegaPolicy.CONSTANT,
                             hit_criterion=HitCriterion.ABSOLUTE,
                             hit_precision=1e-5, march_t0=5e-4,
                             max_raymarch=256, max_dis=2000.0),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_hit_sphere_all_policies(name):
    cfg = CONFIGS[name]
    scene = sphere_scene()
    o, d = head_on_rays()
    res = ml.march(scene, o, d, cfg, differentiable=False)
    assert bool(res.hit.all())
    t = np.array(res.t)
    tol = max(4 * 4 * cfg.pixel_radius, 1e-3)
    if name == "tokyo":
        # The half-up policy keeps w > 1; on a head-on convex hit the field
        # is linear along the ray so the overstep test (ld + d < s,
        # tokyo_ibl.py:253) sits exactly at equality and the march tunnels
        # through the two-sided surface, hitting the far side (t=6) from
        # inside — faithful to the reference's own algorithm.
        assert (np.all(np.abs(t - 4.0) < tol)
                or np.all(np.abs(t - 6.0) < tol))
    else:
        np.testing.assert_allclose(t, 4.0, atol=tol)


def test_miss_escapes():
    cfg = CONFIGS["src_engine"]
    scene = sphere_scene()
    o = jnp.array([[0.0, 3.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = ml.march(scene, o, d, cfg, differentiable=False)
    assert not bool(res.hit[0])
    assert float(res.t[0]) >= cfg.max_dis * 0.9


def test_escape_bound_preserves_hits_and_speeds_misses():
    """escape_bound terminates receding miss lanes early without changing
    any hit result (a miss's shading depends only on direction)."""
    cfg = CONFIGS["src_engine"].replace(max_raymarch=128)
    scene = sphere_scene()
    o = jnp.array([[0.0, 0.0, 5.0],    # hit
                   [0.0, 3.0, 5.0],    # miss, passes by
                   [0.0, 0.0, 5.0]])   # miss, points away
    d = jnp.array([[0.0, 0.0, -1.0],
                   [0.0, 0.0, -1.0],
                   [0.0, 0.0, 1.0]])
    a = ml.march(scene, o, d, cfg, differentiable=False)
    b = ml.march(scene, o, d, cfg.replace(escape_bound=True),
                 differentiable=False)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_allclose(float(a.t[0]), float(b.t[0]), rtol=1e-6)
    assert int(b.iters) < int(a.iters)  # escapers exit before max_dis
    # lane pointing away from the scene escapes in very few steps
    assert float(b.t[2]) < cfg.max_dis


def test_bounding_radius_none_for_plane_scene():
    s = sc.make_scene([ObjectSpec(SHAPE.PLANE, scale=(1, 1, 1))])
    assert sc.bounding_radius(s) is None
    # escape_bound silently disables for unbounded scenes
    o = jnp.array([[0.0, 2.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    res = ml.march(s, o, d,
                   CONFIGS["src_engine"].replace(escape_bound=True,
                                                 max_raymarch=128),
                   differentiable=False)
    assert bool(res.hit[0])


def test_snapped_wall_perpendicular_no_tunneling():
    """Regression: with snapped axis-aligned rotations, a perpendicular ray
    at the engine-default w=1.6 lands EXACTLY on the touching-bounds knife
    edge (ld + d == s in exact f32) — the reference's strict `<` rollback
    (src/scene.py:67) tunnels through the wall. Our epsilon-relaxed rollback
    must hit, for a cornell-wall-like box from a range of heights."""
    cfg = CONFIGS["src_engine"].replace(max_raymarch=256)
    # thin axis-aligned box "wall" spanning y=0 plane region, like a
    # cornell wall after _snap_and_classify makes its rotation exact
    wall = sc.make_scene([ObjectSpec(SHAPE.BOX, position=(0, -0.05, 0),
                                     scale=(4.0, 0.05, 4.0))],
                         box_round=0.0)
    heights = jnp.array([0.5, 1.0, 2.0, 3.0, 4.0, 8.0])
    o = jnp.stack([jnp.zeros_like(heights), heights,
                   jnp.zeros_like(heights)], -1)
    d = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (len(heights), 1))
    res = ml.march(wall, o, d, cfg, differentiable=False)
    assert bool(res.hit.all()), np.asarray(res.hit)
    # each lane stops at its wall surface, not beyond it
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(heights),
                               rtol=0.05)


def test_interior_ray_hits_from_inside():
    """abs() in nearest makes surfaces two-sided (src/scene.py:52)."""
    cfg = CONFIGS["glass"]
    scene = sphere_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = ml.march(scene, o, d, cfg, differentiable=False)
    assert bool(res.hit[0])
    np.testing.assert_allclose(float(res.t[0]), 1.0, atol=0.02)


def test_early_exit_iteration_count():
    cfg = CONFIGS["src_engine"]
    scene = sphere_scene()
    o, d = head_on_rays()
    res = ml.march(scene, o, d, cfg, differentiable=False)
    # while_loop exits as soon as every lane is done — far fewer than 512
    assert int(res.iters) < 64


def test_mixed_batch_lockstep():
    cfg = CONFIGS["src_engine"]
    scene = sphere_scene()
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 3.0, 5.0], [0.0, 0.99, 5.0]])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
    res = ml.march(scene, o, d, cfg, differentiable=False)
    assert bool(res.hit[0]) and not bool(res.hit[1])
    # grazing ray (lane 2) may hit or miss under the cone criterion; its
    # result must match a solo march (lock-step masking is lane-independent)
    solo = ml.march(scene, o[2:], d[2:], cfg, differentiable=False)
    assert bool(res.hit[2]) == bool(solo.hit[0])
    np.testing.assert_allclose(float(res.t[2]), float(solo.t[0]), rtol=1e-5)


class TestImplicitGradients:
    def test_dt_dradius_head_on(self):
        """t*(r) = z - r for a head-on ray => dt/dr = -1."""
        cfg = CONFIGS["shortest"]
        o, d = head_on_rays(1)

        def t_of_r(r):
            scene = sc.make_scene([ObjectSpec(
                SHAPE.SPHERE, position=(0, 0, 0), scale=(1, 1, 1))])
            scene = scene.replace(scale=jnp.full((1, 3), r))
            return ml.march(scene, o, d, cfg).t[0]

        g = float(jax.grad(t_of_r)(jnp.asarray(1.0)))
        assert g == pytest.approx(-1.0, abs=2e-2)

    def test_dt_dorigin(self):
        """Moving the origin toward the sphere shortens t by the same amount."""
        cfg = CONFIGS["shortest"]
        scene = sphere_scene()
        d = jnp.array([[0.0, 0.0, -1.0]])

        def t_of_z(z):
            o = jnp.stack([jnp.zeros(()), jnp.zeros(()), z])[None]
            return ml.march(scene, o, d, cfg).t[0]

        g = float(jax.grad(t_of_z)(jnp.asarray(5.0)))
        assert g == pytest.approx(1.0, abs=2e-2)

    def test_dt_dposition_finite_difference(self):
        cfg = CONFIGS["shortest"]
        o, d = head_on_rays(1)

        def t_of_pz(pz):
            scene = sphere_scene()
            scene = scene.replace(
                position=scene.position.at[0, 2].set(pz))
            return ml.march(scene, o, d, cfg).t[0]

        g = float(jax.grad(t_of_pz)(jnp.asarray(0.0)))
        eps = 1e-3
        fd = (float(t_of_pz(jnp.asarray(eps)))
              - float(t_of_pz(jnp.asarray(-eps)))) / (2 * eps)
        assert g == pytest.approx(fd, abs=3e-2)
        # moving the sphere toward the camera (+z) shortens the hit distance
        assert g == pytest.approx(-1.0, abs=3e-2)

    def test_miss_has_zero_grad(self):
        cfg = CONFIGS["shortest"]
        d = jnp.array([[0.0, 0.0, -1.0]])

        def t_sum(r):
            scene = sphere_scene()
            scene = scene.replace(scale=jnp.full((1, 3), r))
            o = jnp.array([[0.0, 3.0, 5.0]])  # misses
            return ml.march(scene, o, d, cfg).t[0]

        assert float(jax.grad(t_sum)(jnp.asarray(1.0))) == 0.0


class TestActiveGate:
    """march(active=...) lets inactive lanes skip the loop entirely — the
    mechanism behind adaptive-sampling and dead-megakernel-lane savings."""

    def test_active_lanes_match_ungated(self):
        cfg = CONFIGS["shortest"]
        o, d = head_on_rays(8)
        scene = sphere_scene()
        active = jnp.array([True, False] * 4)
        full = ml.march(scene, o, d, cfg, differentiable=False)
        gated = ml.march(scene, o, d, cfg, differentiable=False,
                         active=active)
        a = np.array(active)
        np.testing.assert_array_equal(np.array(gated.hit)[a],
                                      np.array(full.hit)[a])
        np.testing.assert_allclose(np.array(gated.t)[a],
                                   np.array(full.t)[a])

    def test_inactive_lanes_stay_at_init(self):
        cfg = CONFIGS["shortest"]
        o, d = head_on_rays(4)
        scene = sphere_scene()
        res = ml.march(scene, o, d, cfg, differentiable=False,
                       active=jnp.zeros((4,), bool))
        assert not np.array(res.hit).any()
        np.testing.assert_allclose(np.array(res.t), cfg.march_t0)
        assert int(res.iters) == 0  # loop never ran
