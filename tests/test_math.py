"""Closed-form checks of the math utilities (reference: src/util.py)."""
import jax.numpy as jnp
import numpy as np

from raytracingpbr_tpu.core import math as m


def test_brightness_luma():
    np.testing.assert_allclose(
        float(m.brightness(jnp.array([1.0, 0.0, 0.0]))), 0.299, rtol=1e-6)
    np.testing.assert_allclose(
        float(m.brightness(jnp.array([1.0, 1.0, 1.0]))), 1.0, rtol=1e-6)


def test_rotate_euler_identity():
    r = np.array(m.rotate_euler(jnp.zeros(3)))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_rotate_euler_z90():
    # 90deg about z: reference convention mat3(cz, sz, 0 / -sz, cz, 0 / 0,0,1)
    r = np.array(m.rotate_euler(jnp.array([0.0, 0.0, np.pi / 2])))
    expected = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], dtype=float)
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_rotate_euler_composition_order():
    # Rz @ Ry @ Rx (src/util.py:36-42)
    a = jnp.array([0.3, -0.7, 1.1])
    r = np.array(m.rotate_euler(a))
    rx = np.array(m.rotate_euler(jnp.array([0.3, 0.0, 0.0])))
    ry = np.array(m.rotate_euler(jnp.array([0.0, -0.7, 0.0])))
    rz = np.array(m.rotate_euler(jnp.array([0.0, 0.0, 1.1])))
    np.testing.assert_allclose(r, rz @ ry @ rx, atol=1e-5)


def test_rotate_euler_batched():
    a = jnp.array([[0.1, 0.2, 0.3], [0.0, 0.0, 0.0]])
    r = np.array(m.rotate_euler(a))
    assert r.shape == (2, 3, 3)
    np.testing.assert_allclose(r[1], np.eye(3), atol=1e-6)


def test_sample_spherical_map_axes():
    # +x axis -> u = 0.5 (atan2(0,1)=0), v = 0.5
    uv = np.array(m.sample_spherical_map(jnp.array([1.0, 0.0, 0.0])))
    np.testing.assert_allclose(uv, [0.5, 0.5], atol=1e-6)
    # +y (up) -> v = 1
    uv = np.array(m.sample_spherical_map(jnp.array([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(uv[1], 1.0, atol=1e-6)
    # +z -> u = 0.75
    uv = np.array(m.sample_spherical_map(jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(uv, [0.75, 0.5], atol=1e-6)


def test_reflect():
    i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.array(m.reflect(i, n))
    np.testing.assert_allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0.0]],
                               atol=1e-6)
