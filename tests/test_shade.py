"""BSDF shading tests (reference: src/pbr.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.config import RenderConfig
from raytracingpbr_tpu.core import rng as rnglib
from raytracingpbr_tpu.ops import scene as sc
from raytracingpbr_tpu.ops import shade
from raytracingpbr_tpu.ops.scene import ObjectSpec
from raytracingpbr_tpu.ops.sdf import SHAPE

CFG = RenderConfig()


def test_fresnel_schlick_values():
    # NoI = -1 (head-on): |1 + NoI|^5 = 0 -> F = F0
    assert float(shade.fresnel_schlick(jnp.asarray(-1.0),
                                       jnp.asarray(0.04))) == \
        pytest.approx(0.04)
    # NoI = 0 (grazing): F = mix(1, 1, F0) = 1
    assert float(shade.fresnel_schlick(jnp.asarray(0.0),
                                       jnp.asarray(0.04))) == \
        pytest.approx(1.0)


def test_fresnel_roughness_variant():
    # roughness=1 pins F to F0 (cornell_box.py:237-238)
    f = shade.fresnel_schlick_roughness(jnp.asarray(0.0), jnp.asarray(0.04),
                                        jnp.asarray(1.0))
    assert float(f) == pytest.approx(0.04)


def _shade_sphere(material, direction, n=4096, seed=0):
    scene = sc.make_scene([ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0),
                                      scale=(1, 1, 1), **material)])
    pos = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray(direction)[None], (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    u = rnglib.uniform4(pid, 0, 2, seed)
    return scene, shade.ray_surface_interaction(scene, idx, pos, d, u, CFG)


def test_mirror_reflection():
    """roughness=0, metallic=1: exact mirror about the surface normal."""
    d_in = np.array([1.0, 0.0, -1.0]) / np.sqrt(2)
    scene, inter = _shade_sphere(
        dict(roughness=0.0, metallic=1.0, transmission=0.0, ior=1.5), d_in)
    out = np.array(inter.direction)
    # surface point (0,0,1), normal +z: reflect flips z component
    expected = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
    np.testing.assert_allclose(out, np.tile(expected, (out.shape[0], 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_glass_refracts_by_snell():
    """transmission=1, roughness=0: refracted lanes obey Snell's law."""
    theta_i = np.deg2rad(30.0)
    d_in = np.array([np.sin(theta_i), 0.0, -np.cos(theta_i)])
    scene, inter = _shade_sphere(
        dict(roughness=0.0, metallic=0.0, transmission=1.0, ior=1.5), d_in)
    out = np.array(inter.direction)
    sin_out = np.abs(out[:, 0])
    # entering lanes (z decreasing): sin_t = sin_i * (1/1.5)
    sin_t = np.sin(theta_i) * CFG.env_ior / 1.5
    refracted = out[:, 2] < 0
    assert refracted.mean() > 0.5  # mostly transmits at 30 degrees
    np.testing.assert_allclose(sin_out[refracted], sin_t, atol=1e-4)
    # reflected lanes mirror the incident angle
    if (~refracted).any():
        np.testing.assert_allclose(sin_out[~refracted], np.sin(theta_i),
                                   atol=1e-4)


def test_diffuse_hemisphere_above_surface():
    d_in = np.array([0.0, 0.0, -1.0])
    scene, inter = _shade_sphere(
        dict(roughness=1.0, metallic=0.0, transmission=0.0, ior=1.0), d_in)
    out = np.array(inter.direction)
    # diffuse lanes leave the surface on the outside (origin offset +normal)
    orig = np.array(inter.origin)
    assert (orig[:, 2] >= 1.0).mean() > 0.95


def test_albedo_multiplies_throughput():
    d_in = np.array([0.0, 0.0, -1.0])
    scene, inter = _shade_sphere(
        dict(albedo=(0.25, 0.5, 0.75), roughness=1.0, metallic=0.0,
             transmission=0.0, ior=1.0), d_in)
    np.testing.assert_allclose(np.array(inter.color_scale)[0],
                               [0.25, 0.5, 0.75], atol=1e-6)


def test_metallic_forces_reflection():
    """metallic=1 makes the lobe test (u < F + metallic) always reflect."""
    d_in = np.array([0.0, 0.0, -1.0])
    scene, inter = _shade_sphere(
        dict(roughness=0.0, metallic=1.0, transmission=1.0, ior=1.5), d_in)
    out = np.array(inter.direction)
    assert (out[:, 2] > 0).all()  # never refracts through


def test_reflect_kill_vs_fold():
    """Example megakernels zero a below-surface reflection
    (cornell_box.py:280); the src/ engine folds it back (src/pbr.py:49-51).
    At roughness=1/metallic=1 every lane reflects about a random microfacet
    normal, so ~half land below the surface."""
    d_in = np.array([0.0, 0.0, -1.0])
    mat = dict(roughness=1.0, metallic=1.0, transmission=0.0, ior=1.5)
    scene = sc.make_scene([ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0),
                                      scale=(1, 1, 1), **mat)])
    n = 4096
    pos = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray(d_in)[None], (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    u = rnglib.uniform4(pid, 0, 2, 0)
    kill = shade.ray_surface_interaction(scene, idx, pos, d, u, CFG,
                                         reflect_kill=True)
    fold = shade.ray_surface_interaction(scene, idx, pos, d, u, CFG,
                                         reflect_kill=False)
    killed = np.array(kill.color_scale)[:, 0] == 0.0
    assert 0.2 < killed.mean() < 0.8  # a real fraction lands below
    # killed lanes keep the below-surface direction (reference continues the
    # ray); folded lanes are flipped above
    below_k = np.array(kill.direction)[killed, 2] < 0
    assert below_k.all()
    assert (np.array(fold.direction)[:, 2] >= 0).all()
    # unkilled lanes agree between the variants
    np.testing.assert_allclose(np.array(kill.direction)[~killed],
                               np.array(fold.direction)[~killed], atol=1e-6)
    # default follows the variant: roughness_fresnel=True -> kill
    dflt = shade.ray_surface_interaction(scene, idx, pos, d, u, CFG,
                                         roughness_fresnel=True)
    assert (np.array(dflt.color_scale)[:, 0] == 0.0).any()


def test_f0_half_halves_reflect_probability():
    """cfg.f0_half (cornell/bunny example F0 = 2a^2, cornell_box.py:275)
    applies only in the example-variant Fresnel and halves the reflect
    probability at roughness=1 (F = F0)."""
    d_in = np.array([0.0, 0.0, -1.0])
    mat = dict(roughness=1.0, metallic=0.0, transmission=0.0, ior=1.53)
    n = 1 << 14
    scene = sc.make_scene([ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0),
                                      scale=(1, 1, 1), **mat)])
    pos = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray(d_in)[None], (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    pid = jnp.arange(n, dtype=jnp.uint32)
    u = rnglib.uniform4(pid, 0, 2, 0)

    def p_reflect(cfg):
        inter = shade.ray_surface_interaction(scene, idx, pos, d, u, cfg,
                                              roughness_fresnel=True)
        # diffuse == (~reflect & ~refract); transmission=0 -> ~diffuse=reflect
        return 1.0 - np.array(inter.diffuse).mean()

    a = (1.53 - CFG.env_ior) / (1.53 + CFG.env_ior)
    p_src = p_reflect(CFG)
    p_half = p_reflect(CFG.replace(f0_half=True))
    assert p_src == pytest.approx(4 * a * a, abs=0.01)     # (2a)^2
    assert p_half == pytest.approx(2 * a * a, abs=0.01)    # 2a^2
    # src-variant Fresnel ignores the flag
    inter_src = shade.ray_surface_interaction(
        scene, idx, pos, d, u, CFG.replace(f0_half=True))
    inter_ref = shade.ray_surface_interaction(scene, idx, pos, d, u, CFG)
    np.testing.assert_allclose(np.array(inter_src.direction),
                               np.array(inter_ref.direction))
