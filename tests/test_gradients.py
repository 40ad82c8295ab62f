"""Render-level gradient correctness: finite-difference vs analytic AD for
every differentiable parameter class (BASELINE.md target: pixel grads to
material / light / SDF-shape / envmap params, allclose at 1e-3 relative).

The counter RNG freezes the sample paths, so FD and AD differentiate the
same deterministic function — comparisons are exact up to f32 + FD error.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops.scene import ObjectSpec
from raytracingpbr_tpu.ops.sdf import SHAPE
from raytracingpbr_tpu.parallel import train as ptrain


def base_cfg(**kw):
    d = dict(resolution=(12, 12), max_raymarch=48, max_raytrace=4,
             light_quality=1e9, roulette=rt.Roulette.EXP,
             omega=1.0, omega_policy=rt.OmegaPolicy.CONSTANT,
             hit_criterion=rt.HitCriterion.ABSOLUTE, hit_precision=1e-4,
             march_t0=0.005, max_dis=100.0)
    d.update(kw)
    return rt.RenderConfig(**d)


CAM = rt.make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                     vfov=40.0, aspect=1.0, aperture=0.0, focus=1.0)


def sphere_scene(albedo=(0.5, 0.5, 0.5), emission=(1.0, 1.0, 1.0),
                 roughness=1.0, radius=1.0):
    return rt.make_scene([ObjectSpec(
        SHAPE.SPHERE, position=(0, 0, 0), scale=(radius,) * 3,
        albedo=albedo, emission=emission, roughness=roughness)])


def render_mean(scene, env, cfg, spp=2):
    pid = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
    img = ptrain.render_pixels(scene, env, CAM, pid, cfg, spp=spp)
    return jnp.mean(img)


def check_fd(f, x0, eps, rel=5e-2, abs_tol=1e-4):
    """Compare d f/dx at x0 against central finite differences."""
    g = float(jax.grad(f)(jnp.asarray(x0)))
    fd = (float(f(jnp.asarray(x0 + eps))) - float(f(jnp.asarray(x0 - eps)))
          ) / (2 * eps)
    assert g == pytest.approx(fd, rel=rel, abs=abs_tol), (g, fd)
    return g, fd


class TestMaterialGradients:
    def test_albedo(self):
        cfg = base_cfg()
        env = rt.white_sky()

        def f(a):
            s = sphere_scene()
            s = s.replace(albedo=s.albedo.at[0, 0].set(a))
            return render_mean(s, env, cfg)

        g, fd = check_fd(f, 0.5, 1e-3, rel=1e-2)
        assert g > 0  # brighter albedo -> brighter image

    def test_emission(self):
        """Light-parameter gradients (the emissive sphere IS the light)."""
        cfg = base_cfg()
        env = rt.black_sky()

        def f(e):
            s = sphere_scene(emission=(1.0, 1.0, 1.0))
            s = s.replace(emission=jnp.full((1, 3), e))
            return render_mean(s, env, cfg)

        # note: emission also changes the brightness-termination decision;
        # at e~2 paths terminate on first hit and d/de is clean
        g, fd = check_fd(f, 2.0, 1e-3, rel=1e-2)
        assert g > 0

    def test_roughness(self):
        cfg = base_cfg()
        env = rt.hdr_environment(
            jnp.asarray(np.random.default_rng(0).uniform(
                0.1, 2.0, (16, 8, 3)).astype(np.float32)), prebake=False)

        def f(r):
            s = sphere_scene(roughness=0.5)
            s = s.replace(roughness=jnp.full((1,), r))
            return render_mean(s, env, cfg)

        check_fd(f, 0.5, 1e-3, rel=0.1, abs_tol=1e-3)


class TestShapeGradients:
    def test_sphere_radius(self):
        """SDF shape parameter via the implicit-function march VJP."""
        cfg = base_cfg()
        env = rt.white_sky()

        def f(r):
            s = sphere_scene()
            s = s.replace(scale=jnp.full((1, 3), r))
            return render_mean(s, env, cfg)

        check_fd(f, 1.0, 1e-3, rel=0.15, abs_tol=2e-3)

    def test_object_position(self):
        cfg = base_cfg()
        env = rt.white_sky()

        def f(z):
            s = sphere_scene()
            s = s.replace(position=s.position.at[0, 2].set(z))
            return render_mean(s, env, cfg)

        check_fd(f, 0.0, 1e-3, rel=0.15, abs_tol=2e-3)


class TestEnvmapGradients:
    def test_envmap_texel(self):
        """Gradients flow through the equirect lookup to envmap texels."""
        cfg = base_cfg()
        img0 = np.full((16, 8, 3), 0.5, np.float32)

        def f(v):
            img = jnp.asarray(img0).at[:, :, 0].mul(0).at[:, :, 0].add(v)
            env = rt.hdr_environment(img, prebake=False)
            return render_mean(sphere_scene(), env, cfg)

        g, fd = check_fd(f, 0.5, 1e-3, rel=1e-2)
        assert g > 0


class TestF64Oracle:
    """The BASELINE.md bar verbatim: finite-difference vs analytic allclose
    at 1e-3 relative, for every differentiable parameter class.

    f32 FD noise makes that bar meaningless at single precision, so this
    class runs the whole render in f64 (``jax.enable_x64`` scoped to the
    test): the camera/scene/env data are f64, the kernels follow the data.
    The scene uses a smooth bilinear HDR env — with a flat white sky the
    radiance is dyadic-quantized (albedo 0.5 powers) and piecewise CONSTANT
    in the geometry parameters, so geometry gradients are legitimately zero
    there; a direction-dependent sky makes them real. Measured agreement is
    ~1e-6..1e-11 per class."""

    CFG = None  # built lazily inside the x64 scope

    @staticmethod
    def _cfg():
        return base_cfg(max_raymarch=64, hit_precision=1e-7)

    @staticmethod
    def _env_img():
        rng = np.random.default_rng(0)
        base = rng.uniform(0.2, 1.5, (8, 4, 3))
        return np.kron(base, np.ones((4, 4, 1)))  # smooth 32x16

    def _check(self, make_f, x0, eps=1e-5, rel=1e-3):
        with jax.enable_x64(True):
            F = jnp.float64
            cfg = self._cfg()
            cam = rt.make_camera(lookfrom=(0.0, 0.0, 3.0),
                                 lookat=(0.0, 0.0, 0.0), vfov=40.0,
                                 aspect=1.0, aperture=0.0, focus=1.0,
                                 dtype=F)
            env = rt.hdr_environment(jnp.asarray(self._env_img(), F),
                                     prebake=False, bilinear=True)
            pid = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)

            def scene64():
                return rt.make_scene([ObjectSpec(
                    SHAPE.SPHERE, position=(0, 0, 0), scale=(1.0,) * 3,
                    albedo=(0.5, 0.5, 0.5), emission=(1.0, 1.0, 1.0),
                    roughness=0.5)], dtype=F)

            def mean_img(s, cam=cam, e=env):
                return jnp.mean(ptrain.render_pixels(s, e, cam, pid, cfg,
                                                     spp=2))

            f = make_f(F, scene64, mean_img, cam)
            g = float(jax.grad(f)(jnp.asarray(x0, F)))
            fd = (float(f(jnp.asarray(x0 + eps, F)))
                  - float(f(jnp.asarray(x0 - eps, F)))) / (2 * eps)
            assert np.isfinite(g) and np.isfinite(fd)
            assert g == pytest.approx(fd, rel=rel, abs=1e-9), (g, fd)

    def test_albedo(self):
        self._check(lambda F, sc, m, cam: lambda a: m(
            sc().replace(albedo=jnp.full((1, 3), a, F))), 0.5)

    def test_emission(self):
        self._check(lambda F, sc, m, cam: lambda e: m(
            sc().replace(emission=jnp.full((1, 3), e, F))), 2.0)

    def test_roughness(self):
        self._check(lambda F, sc, m, cam: lambda r: m(
            sc().replace(roughness=jnp.full((1,), r, F))), 0.5)

    def test_sphere_radius(self):
        self._check(lambda F, sc, m, cam: lambda r: m(
            sc().replace(scale=jnp.full((1, 3), r, F))), 1.0)

    def test_object_position(self):
        self._check(lambda F, sc, m, cam: lambda z: m(
            sc().replace(position=jnp.zeros((1, 3), F).at[0, 2].set(z))),
            0.0)

    def test_envmap(self):
        def make(F, sc, m, cam):
            img = jnp.asarray(self._env_img(), F)

            def f(v):
                e = rt.hdr_environment(img * v, prebake=False, bilinear=True)
                return m(sc(), e=e)
            return f
        self._check(make, 1.0)

    def test_camera_lookfrom(self):
        self._check(lambda F, sc, m, cam: lambda z: m(
            sc(), cam=cam.replace(lookfrom=cam.lookfrom.at[2].set(z))), 3.0)


class TestCameraGradients:
    def test_lookfrom(self):
        cfg = base_cfg()
        env = rt.white_sky()
        scene = sphere_scene(albedo=(0.3, 0.3, 0.3))

        def f(z):
            cam = CAM.replace(lookfrom=CAM.lookfrom.at[2].set(z))
            pid = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
            img = ptrain.render_pixels(scene, env, cam, pid, cfg, spp=2)
            return jnp.mean(img)

        check_fd(f, 3.0, 1e-3, rel=0.2, abs_tol=2e-3)
