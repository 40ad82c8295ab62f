"""Scene SoA / nearest / normal tests (reference: src/scene.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.ops import scene as sc
from raytracingpbr_tpu.ops.sdf import SHAPE
from raytracingpbr_tpu.ops.scene import ObjectSpec


def simple_scene():
    return sc.make_scene([
        ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0), scale=(1, 1, 1)),
        ObjectSpec(SHAPE.BOX, position=(3, 0, 0), scale=(1, 1, 1)),
        ObjectSpec(SHAPE.SPHERE, position=(-3, 0, 0), scale=(0.5, 1, 1)),
        ObjectSpec(SHAPE.CYLINDER, position=(0, 0, 5), scale=(1, 1, 1)),
    ], box_round=0.0)


def test_sorted_and_bucketed():
    s = simple_scene()
    assert s.shape_types == (1, 1, 2, 3)  # spheres, box, cylinder
    assert s.type_splits == (0, 2, 3, 4)
    assert s.bucket_types == (1, 2, 3)


def test_nearest_picks_closest():
    s = simple_scene()
    p = jnp.array([[0.0, 2.5, 0.0],    # closest: unit sphere at origin
                   [3.0, 2.1, 0.0],    # closest: box
                   [-3.0, 0.0, 0.0]])  # inside small sphere (abs -> 0.5)
    idx, dis = sc.nearest(s, p)
    idx = np.array(idx)
    # objects sorted: [sphere@0, sphere@-3, box@3, cyl@5] by type then order
    d_all = np.abs(np.array(sc.all_distances(s, p)))
    np.testing.assert_array_equal(idx, d_all.argmin(-1))
    np.testing.assert_allclose(np.array(dis), d_all.min(-1), rtol=1e-6)


def test_all_distances_against_bruteforce():
    """The bucketed trace-time dispatch equals a brute-force per-object eval."""
    from raytracingpbr_tpu.ops import sdf as sdflib
    s = simple_scene()
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
    d = np.array(sc.all_distances(s, p))
    fns = {1: sdflib.sd_sphere, 2: sdflib.sd_box, 3: sdflib.sd_cylinder}
    for i, t in enumerate(s.shape_types):
        pl = sdflib.to_object_space(p, s.position[i], s.matrix[i])
        expected = np.array(fns[t](pl, jnp.broadcast_to(s.scale[i], pl.shape)))
        np.testing.assert_allclose(d[:, i], expected, rtol=1e-5, atol=1e-6)


def test_sd_object_matches_all_distances():
    s = simple_scene()
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
    d_all = np.array(sc.all_distances(s, p))
    for i in range(s.num_objects):
        idx = jnp.full((64,), i, jnp.int32)
        d = np.array(sc.sd_object(s, idx, p))
        np.testing.assert_allclose(d, d_all[:, i], rtol=1e-5, atol=1e-6)


def test_normal_sphere_is_radial():
    s = simple_scene()
    p = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    idx = jnp.zeros(2, jnp.int32)
    n = np.array(sc.calc_normal(s, idx, p))
    np.testing.assert_allclose(n, [[0, 1, 0], [1, 0, 0]], atol=1e-5)


def test_normal_analytic_matches_tetrahedron():
    s = simple_scene()
    rng = np.random.default_rng(3)
    # points near the unit sphere surface
    d = rng.normal(size=(32, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = jnp.asarray(d * 1.001, jnp.float32)
    idx = jnp.zeros(32, jnp.int32)
    na = np.array(sc.calc_normal(s, idx, p))
    nt = np.array(sc.calc_normal_tetrahedron(s, idx, p))
    np.testing.assert_allclose(na, nt, atol=5e-3)


def test_rotation_baking():
    s = sc.make_scene([
        ObjectSpec(SHAPE.BOX, position=(0, 0, 0), rotation=(0, 90, 0),
                   scale=(2, 1, 0.2))], box_round=0.0)
    # rotating 90 about y maps world x into object z: a point at world
    # (1.5, 0, 0) must be inside (half-extent z is 0.2 -> outside!),
    # whereas world (0.1, 0, 1.9) maps near object (x ~ -1.9? sign per
    # reference convention) — just check distances are consistent with a
    # manually rotated query.
    from raytracingpbr_tpu.ops import sdf as sdflib
    p = jnp.array([[1.5, 0.3, 0.0]])
    d = float(sc.all_distances(s, p)[0, 0])
    pl = np.array(sdflib.to_object_space(p, s.position[0], s.matrix[0]))[0]
    expected = float(sdflib.sd_box(jnp.asarray(pl)[None],
                                   s.scale[:1])[0])
    assert d == pytest.approx(expected, rel=1e-6)
    # and the rotated box is thin along world x now
    assert float(sc.all_distances(s, jnp.array([[0.0, 0.0, 1.5]]))[0, 0]) < 0


def test_animate_spin_and_bob():
    s = sc.make_scene([ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0),
                                  scale=(1, 1, 1))])
    s2 = sc.animate(s, jnp.asarray(60), period=120.0, bob=0.1)
    # frame 60 -> t = pi/2: offset z = 0.1*sin(pi/2) = 0.1
    np.testing.assert_allclose(np.array(s2.local_offset)[0],
                               [0.0, 0.0, 0.1], atol=1e-6)
    # sphere is rotation-invariant: distances unchanged up to the offset
    p = jnp.array([[0.0, 0.0, 2.0]])
    d = float(sc.all_distances(s2, p)[0, 0])
    # object-space query gets +0.1 z offset after rotation; sphere at origin
    # with r=1: |R@p + off| - 1
    pl = np.array(s2.matrix[0]) @ np.array([0.0, 0.0, 2.0]) + [0, 0, 0.1]
    assert d == pytest.approx(np.linalg.norm(pl) - 1.0, rel=1e-5)


def test_scene_is_differentiable_pytree():
    s = simple_scene()
    def loss(scene):
        p = jnp.array([[0.0, 2.0, 0.0]])
        _, d = sc.nearest(scene, p)
        return jnp.sum(d)
    g = jax.grad(loss)(s)
    # moving the nearest sphere's radius changes the distance: d = 2 - r
    assert float(g.scale[0, 0]) == pytest.approx(-1.0, rel=1e-4)
