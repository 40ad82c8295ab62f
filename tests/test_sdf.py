"""SDF primitive closed-form tests (reference math: src/sdf.py,
bunny MLP: bunny_sdf_glass.py:150-203)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.ops import sdf


def v(*args):
    return jnp.asarray([args], dtype=jnp.float32)


def test_sphere():
    s = v(2.0, 0, 0)
    assert float(sdf.sd_sphere(v(3.0, 0, 0), s)[0]) == pytest.approx(1.0)
    assert float(sdf.sd_sphere(v(0, 0, 0), s)[0]) == pytest.approx(-2.0)
    assert float(sdf.sd_sphere(v(0, 2.0, 0), s)[0]) == pytest.approx(0.0)


def test_box_faces_and_corner():
    b = v(1.0, 2.0, 3.0)
    assert float(sdf.sd_box(v(2.0, 0, 0), b)[0]) == pytest.approx(1.0)
    # outside along a corner: distance to the corner point
    d = float(sdf.sd_box(v(2.0, 3.0, 4.0), b)[0])
    assert d == pytest.approx(np.sqrt(3.0), rel=1e-5)
    # inside: negative max-axis penetration
    assert float(sdf.sd_box(v(0.5, 0, 0), b)[0]) == pytest.approx(-0.5)


def test_round_box_reference_radius():
    # src/sdf.py:34 bakes -0.03 into the engine's box
    b = v(1.0, 1.0, 1.0)
    assert float(sdf.sd_round_box(v(2.0, 0, 0), b, 0.03)[0]) == \
        pytest.approx(0.97, rel=1e-5)


def test_cylinder():
    s = v(1.0, 2.0, 0.0)  # radius 1, half-height 2
    assert float(sdf.sd_cylinder(v(3.0, 0, 0), s)[0]) == pytest.approx(2.0)
    assert float(sdf.sd_cylinder(v(0, 3.0, 0), s)[0]) == pytest.approx(1.0)
    assert float(sdf.sd_cylinder(v(0, 0, 0), s)[0]) == pytest.approx(-1.0)
    # outside both: corner distance
    d = float(sdf.sd_cylinder(v(2.0, 3.0, 0), s)[0])
    assert d == pytest.approx(np.sqrt(2.0), rel=1e-5)


def test_plane():
    s = v(0.0, 1.5, 0.0)
    assert float(sdf.sd_plane(v(7.0, 2.0, -3.0), s)[0]) == pytest.approx(0.5)
    assert float(sdf.sd_plane(v(0.0, 0.0, 0.0), s)[0]) == pytest.approx(-1.5)


def test_cone_formula():
    # max(dot(rh.xz, (q, y)), -rh.y - y) with q = |p.xz| (src/sdf.py:43-46)
    s = v(0.6, 1.0, 0.8)
    p = v(3.0, -4.0, 4.0)
    q = np.sqrt(3.0**2 + 4.0**2)
    expected = max(0.6 * q + 0.8 * (-4.0), -1.0 + 4.0)
    assert float(sdf.sd_cone(p, s)[0]) == pytest.approx(expected, rel=1e-5)


def test_none_is_far():
    assert float(sdf.sd_none(v(0, 0, 0), v(0, 0, 0))[0]) == sdf.MAX_DIS


def test_to_object_space():
    from raytracingpbr_tpu.core.math import rotate_euler
    mat = rotate_euler(jnp.array([0.0, 0.0, jnp.pi / 2]))
    p = jnp.array([[2.0, 1.0, 0.0]])
    out = np.array(sdf.to_object_space(p, jnp.array([1.0, 1.0, 0.0]), mat))
    # translate -> (1, 0, 0); rotate by reference z-90 matrix -> (0, -1, 0)
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)


class TestBunny:
    def test_inside_outside(self):
        mlp = sdf.load_bunny()
        # body center is inside
        assert float(sdf.sd_bunny(v(0.0, -0.1, 0.0), mlp)[0]) < 0.0
        # far corner inside unit sphere but outside bunny
        assert float(sdf.sd_bunny(v(0.7, 0.0, 0.65), mlp)[0]) > 0.0

    def test_unit_sphere_fallback(self):
        mlp = sdf.load_bunny()
        d = float(sdf.sd_bunny(v(2.0, 0.0, 0.0), mlp)[0])
        assert d == pytest.approx(1.2, rel=1e-5)  # |p| - 0.8

    def test_gradient_magnitude_reasonable(self):
        # an SDF-like field: gradient norm within a sane band near surface
        mlp = sdf.load_bunny()
        g = jax.grad(lambda p: sdf.sd_bunny(p[None], mlp)[0])
        pts = np.random.default_rng(0).uniform(-0.6, 0.6, (32, 3))
        norms = [float(jnp.linalg.norm(g(jnp.asarray(p, jnp.float32))))
                 for p in pts]
        assert 0.1 < np.median(norms) < 10.0

    def test_marchable_surface(self):
        """Sphere-trace a ray at the bunny and confirm a hit with small
        residual (end-to-end sanity of the extracted weights)."""
        mlp = sdf.load_bunny()
        o = np.array([0.0, -0.1, 2.0])
        d = np.array([0.0, 0.0, -1.0])
        t = 0.0
        for _ in range(128):
            dist = float(sdf.sd_bunny(jnp.asarray((o + t * d))[None], mlp)[0])
            if dist < 1e-4:
                break
            t += 0.9 * dist
        assert dist < 1e-3
        assert 0.5 < t < 2.5


def test_tetrahedron_normal_matches_analytic_sphere():
    f = lambda p: sdf.sd_sphere(p, jnp.array([1.0, 0, 0]))
    p = jnp.array([[0.0, 2.0, 0.0]])
    n = np.array(sdf.tetrahedron_normal(f, p))
    np.testing.assert_allclose(n, [[0.0, 1.0, 0.0]], atol=1e-3)
