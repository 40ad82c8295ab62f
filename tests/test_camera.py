"""Thin-lens camera tests (reference: src/camera.py:11-36)."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.core.types import make_camera
from raytracingpbr_tpu.ops import camera as cam


def _rays(c, uv, u1=None, u2=None):
    n = uv.shape[0]
    z = jnp.zeros((n,))
    return cam.get_ray(c, uv, u1 if u1 is not None else z,
                       u2 if u2 is not None else z)


def test_center_ray_points_at_lookat():
    c = make_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0), vfov=40,
                    aspect=1.0, aperture=0.0, focus=3.0)
    r = _rays(c, jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(np.array(r.origin), [[0, 0, 5]], atol=1e-6)
    np.testing.assert_allclose(np.array(r.direction), [[0, 0, -1]], atol=1e-6)


def test_fov_geometry():
    """uv=(1, 0.5) is the right film edge: angle = vfov/2 * aspect (flat)."""
    vfov = 50.0
    c = make_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0), vfov=vfov,
                    aspect=1.0, aperture=0.0, focus=2.0)
    r = _rays(c, jnp.array([[1.0, 0.5]]))
    d = np.array(r.direction)[0]
    angle = np.arctan2(abs(d[0]), abs(d[2]))
    assert angle == pytest.approx(np.deg2rad(vfov / 2), rel=1e-5)


def test_aspect_scales_horizontal():
    c = make_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0), vfov=40,
                    aspect=2.0, aperture=0.0, focus=2.0)
    rh = _rays(c, jnp.array([[1.0, 0.5]]))
    rv = _rays(c, jnp.array([[0.5, 1.0]]))
    th = np.arctan2(abs(np.array(rh.direction)[0, 0]),
                    abs(np.array(rh.direction)[0, 2]))
    tv = np.arctan2(abs(np.array(rv.direction)[0, 1]),
                    abs(np.array(rv.direction)[0, 2]))
    assert np.tan(th) == pytest.approx(2.0 * np.tan(tv), rel=1e-4)


def test_aperture_spreads_origins_but_focuses_at_plane():
    c = make_camera(lookfrom=(0, 0, 5), lookat=(0, 0, 0), vfov=40,
                    aspect=1.0, aperture=0.5, focus=5.0)
    n = 512
    uv = jnp.tile(jnp.array([[0.5, 0.5]]), (n, 1))
    u1 = jnp.linspace(0.01, 0.99, n)
    u2 = jnp.linspace(0.01, 0.99, n) ** 2
    r = _rays(c, uv, u1, u2)
    o = np.array(r.origin)
    d = np.array(r.direction)
    # origins jittered on the lens disk (radius aperture/2)
    radii = np.linalg.norm(o[:, :2], axis=-1)
    assert radii.max() <= 0.25 + 1e-5
    assert radii.std() > 0.01
    # all rays converge at the focus plane point (0, 0, 0)
    tstar = (o[:, 2] - 0.0) / -d[:, 2]
    pts = o + tstar[:, None] * d
    np.testing.assert_allclose(pts[:, :2], 0.0, atol=1e-5)


def test_pixel_uv_layout():
    # flat id = i * height + j (x-major); uv = ((i+jx)/W, (j+jy)/H)
    pid = jnp.array([0, 3, 4], dtype=jnp.uint32)  # H=4: (0,0), (0,3), (1,0)
    z = jnp.zeros(3)
    uv = np.array(cam.pixel_uv(pid, width=2, height=4, jx=z, jy=z))
    np.testing.assert_allclose(uv, [[0, 0], [0, 0.75], [0.5, 0]], atol=1e-6)


def test_smooth_camera_damping_converges():
    s = cam.make_smooth_camera((0, 0, 0), (0, 0, -1))
    target_p = jnp.array([1.0, 0.0, 0.0])
    target_l = jnp.array([1.0, 0.0, -1.0])
    up = jnp.array([0.0, 1.0, 0.0])
    for _ in range(50):
        s = cam.smooth_update(s, 0.05, target_p, target_l, up)
    np.testing.assert_allclose(np.array(s.position), [1, 0, 0], atol=1e-3)
    assert not bool(s.moving)  # settled
