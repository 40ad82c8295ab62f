"""Environment importance sampling (NEE) — correctness of the partitioned
estimator behind ``cfg.env_sampling``.

The reference's IBL is a plain equirect lookup (``src/ibl.py:37-40``): bright
sparse sky features (a sun) converge only by chance BSDF hits. NEE draws one
alias-table direction per continuing vertex, weighted by the lobe-roulette's
conditional diffuse probability at that direction
(``shade.diffuse_lobe_prob``), and zeroes the sky for diffuse-sampled
continuations — an exact partition of the env integrand:

* the MEAN must match the plain estimator (both integrators);
* the per-pixel VARIANCE on a sun-lit scene must drop well below 0.5x
  (VERDICT r2 item 5's acceptance bar).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.ops import ibl as ibllib
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.ops.scene import ObjectSpec
from raytracingpbr_tpu.ops.sdf import SHAPE


def sun_env():
    """Dim sky with a small bright sun patch — the NEE stress case."""
    img = np.full((32, 16, 3), 0.05, np.float32)
    img[8:12, 11:15] = 25.0
    return rt.hdr_environment(jnp.asarray(img), prebake=False)


def sun_scene():
    return rt.make_scene([
        ObjectSpec(SHAPE.SPHERE, position=(0, -101, 0), scale=(100,) * 3,
                   albedo=(0.7, 0.7, 0.7), roughness=1.0),
        ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0), scale=(1.0,) * 3,
                   albedo=(0.6, 0.4, 0.3), roughness=1.0),
    ])


CAM = rt.make_camera(lookfrom=(0, 1.0, 4.0), lookat=(0, 0, 0), vfov=40.0,
                     aspect=1.0, aperture=0.0, focus=1.0)


def base_cfg(**kw):
    d = dict(resolution=(12, 12), max_raymarch=48, max_raytrace=4,
             light_quality=1e9, roulette=rt.Roulette.EXP,
             omega=1.0, omega_policy=rt.OmegaPolicy.CONSTANT,
             hit_criterion=rt.HitCriterion.ABSOLUTE, hit_precision=1e-4,
             march_t0=0.005, max_dis=300.0)
    d.update(kw)
    return rt.RenderConfig(**d)


def test_with_env_sampler_requires_hdr():
    with pytest.raises(ValueError):
        ibllib.with_env_sampler(rt.white_sky())


def test_baked_sampler_matches_alias_sampler():
    env = sun_env()
    baked = ibllib.with_env_sampler(env)
    alias = ibllib.build_env_alias_sampler(env)
    u = jnp.linspace(0.01, 0.99, 257)
    u2 = (u * 7.3) % 1.0  # independent accept-test uniform
    d1, r1, p1 = ibllib.sample_env_baked(baked, u, u2)
    d2, r2, p2 = ibllib.sample_env_alias(alias, u, u2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)


def test_baked_sampler_distribution():
    """Empirical draw frequency ~ pdf * solid angle per texel."""
    env = ibllib.with_env_sampler(sun_env())
    n = 200_000
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n  # stratified
    d, radiance, pdf = ibllib.sample_env_baked(env, u)
    # all returned pdfs are the pdf of the drawn texel; check the sun patch
    # is drawn with probability close to its luminance share (>0.97 here)
    lum_sun = 25.0 * 16
    lum_all = lum_sun + 0.05 * (32 * 16 - 16)
    # weight by sin(theta) as the builder does: just check dominance
    frac_bright = float(jnp.mean((radiance[:, 0] > 1.0)))
    assert frac_bright > 0.8, frac_bright
    assert float(jnp.min(pdf)) > 0.0


class TestMeanAndVariance:
    def test_megakernel_mean_and_variance(self):
        """Sun-lit scene: NEE matches the plain mean and slashes variance
        (acceptance: variance ratio < 0.5; measured ~0.03)."""
        env = sun_env()
        env_s = ibllib.with_env_sampler(env)
        scene = sun_scene()
        cfg = base_cfg()
        K, SPP = 8, 8

        def render(cfg, env, seed):
            return np.asarray(integ.render_image(
                scene, env, CAM, cfg.replace(seed=seed), spp=SPP,
                tonemapped=False))

        off = np.stack([render(cfg, env, s) for s in range(K)])
        on = np.stack([render(cfg.replace(env_sampling=True), env_s, s)
                       for s in range(K)])
        m_off, m_on = off.mean(), on.mean()
        assert m_on == pytest.approx(m_off, rel=0.25), (m_on, m_off)
        v_off = off.var(axis=0).mean()
        v_on = on.var(axis=0).mean()
        assert v_on < 0.5 * v_off, (v_on, v_off)

    def test_megakernel_src_material_mean(self):
        """The src-engine material variant's lobe roulette is correlated
        with the scatter direction — the P_diffuse(ω_l) weight keeps the
        partition exact (a plain diffuse-selected gate is ~1.7x bright).
        The plain baseline is noisy (sun via chance BSDF hits: single-seed
        means ranged 0.152-0.170 in a 40-seed study; the 10k-spp truth is
        0.16875 +- 0.001 vs MIS 0.17002 +- 0.0007), so average seeds."""
        env = sun_env()
        env_s = ibllib.with_env_sampler(env)
        scene = sun_scene()
        cfg = base_cfg(max_raytrace=8)
        kw = dict(roughness_fresnel=False, restart_at_hit=False,
                  tonemapped=False, spp=256)
        off = np.mean([np.asarray(integ.render_image(
            scene, env, CAM, cfg.replace(seed=s), **kw)) for s in range(4)])
        on = np.mean([np.asarray(integ.render_image(
            scene, env_s, CAM, cfg.replace(env_sampling=True, seed=s),
            **kw)) for s in range(4)])
        assert on == pytest.approx(off, rel=0.1), (on, off)

    def test_megakernel_mean_realistic_roulette(self):
        """EXP roulette with real path death (light_quality small enough
        that roulette actually truncates): the bank's exp(-(i+1)/lq)
        survival compensation and the final-iteration gate keep the
        partitioned mean aligned with the plain estimator (ADVICE r3 — at
        light_quality=1e9 nothing dies and this path was unexercised)."""
        env = sun_env()
        env_s = ibllib.with_env_sampler(env)
        scene = sun_scene()
        cfg = base_cfg(max_raytrace=8, light_quality=16.0)
        K, SPP = 6, 32

        def render(cfg, env, seed):
            return np.asarray(integ.render_image(
                scene, env, CAM, cfg.replace(seed=seed), spp=SPP,
                tonemapped=False))

        off = np.stack([render(cfg, env, s) for s in range(K)])
        on = np.stack([render(cfg.replace(env_sampling=True), env_s, s)
                       for s in range(K)])
        m_off, m_on = off.mean(), on.mean()
        assert m_on == pytest.approx(m_off, rel=0.15), (m_on, m_off)

    def test_wavefront_mean(self):
        """Wavefront integrator (DEPTH_LINEAR roulette, deposit/respawn)
        preserves the mean with env_sampling at a realistic bounce budget."""
        env = sun_env()
        env_s = ibllib.with_env_sampler(env)
        scene = sun_scene()
        cfg = base_cfg(max_raytrace=64, roulette=rt.Roulette.DEPTH_LINEAR)
        off, _ = integ.render_image_progressive(
            scene, env, CAM, cfg, spp=192, tonemapped=False)
        on, _ = integ.render_image_progressive(
            scene, env_s, CAM, cfg.replace(env_sampling=True), spp=192,
            tonemapped=False)
        m_off = float(np.mean(np.asarray(off)))
        m_on = float(np.mean(np.asarray(on)))
        assert m_on == pytest.approx(m_off, rel=0.15), (m_on, m_off)


def front_sun_env():
    """Sun placed in FRONT of the camera (+z, high) so the glossy metal
    surfaces' visible reflection lobes actually cover it."""
    img = np.full((32, 16, 3), 0.05, np.float32)
    img[24:28, 11:15] = 25.0
    return rt.hdr_environment(jnp.asarray(img), prebake=False)


def glossy_scene():
    """Sun-lit all-metal scene — the specular-MIS stress case: no diffuse
    lobe exists (metallic=1 forces the reflect lobe), so with BSDF sampling
    alone the small sun converges only by chance lobe hits."""
    return rt.make_scene([
        ObjectSpec(SHAPE.SPHERE, position=(0, -101, 0), scale=(100,) * 3,
                   albedo=(0.7, 0.7, 0.7), roughness=0.8, metallic=1.0),
        ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0), scale=(1.0,) * 3,
                   albedo=(0.9, 0.9, 0.9), roughness=0.5, metallic=1.0),
    ])


class TestSpecularMIS:
    """One-sample balance-heuristic MIS for the reflect lobe
    (cfg.mis_specular; VERDICT r3 item 7)."""

    def test_glossy_mean_and_variance(self):
        """Acceptance: variance ratio < 0.5 at equal spp with matching mean
        on the sun-lit glossy scene."""
        env = front_sun_env()
        env_s = ibllib.with_env_sampler(env)
        scene = glossy_scene()
        cfg = base_cfg(max_raytrace=6)
        K, SPP = 8, 8

        def render(cfg, env, seed):
            return np.asarray(integ.render_image(
                scene, env, CAM, cfg.replace(seed=seed), spp=SPP,
                tonemapped=False))

        off = np.stack([render(cfg, env, s) for s in range(K)])
        on = np.stack([render(cfg.replace(env_sampling=True), env_s, s)
                       for s in range(K)])
        m_off, m_on = off.mean(), on.mean()
        assert m_on == pytest.approx(m_off, rel=0.25), (m_on, m_off)
        v_off = off.var(axis=0).mean()
        v_on = on.var(axis=0).mean()
        assert v_on < 0.5 * v_off, (v_on, v_off)

    def test_mis_beats_diffuse_only_nee_on_glossy(self):
        """Without the spec term (mis_specular=False) the glossy sphere
        converges at BSDF-sampling rates — the MIS term must reduce its
        variance further."""
        env = front_sun_env()
        env_s = ibllib.with_env_sampler(env)
        scene = glossy_scene()
        cfg = base_cfg(max_raytrace=6, env_sampling=True)
        K, SPP = 8, 8

        def var_of(cfg):
            imgs = np.stack([np.asarray(integ.render_image(
                scene, env_s, CAM, cfg.replace(seed=s), spp=SPP,
                tonemapped=False)) for s in range(K)])
            return imgs.var(axis=0).mean()

        v_mis = var_of(cfg)
        v_no = var_of(cfg.replace(mis_specular=False))
        assert v_mis < 0.6 * v_no, (v_mis, v_no)

    def test_specular_density_integrates_to_selection_prob(self):
        """specular_env_density is a true joint density: integrated over the
        sphere it must equal E_h[P_reflect(m(h))] (the marginal selection
        probability), checked by Monte-Carlo against direct simulation."""
        from raytracingpbr_tpu.ops import shade as shadelib
        from raytracingpbr_tpu.core import rng as rnglib
        scene = glossy_scene()
        cfg = base_cfg()
        n = 200_000
        rng = np.random.default_rng(0)
        normal = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)), jnp.float32)
        d = np.array([0.6, -0.7, 0.2])
        d /= np.linalg.norm(d)
        direction = jnp.asarray(np.tile(d[None], (n, 1)), jnp.float32)
        idx = jnp.ones((n,), jnp.int32)  # the glossy sphere's material
        outer = jnp.ones((n,), bool)

        # uniform directions over the sphere
        z = rng.uniform(-1, 1, n).astype(np.float32)
        phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        r = np.sqrt(np.maximum(1 - z * z, 0))
        w = jnp.asarray(
            np.stack([r * np.cos(phi), z, r * np.sin(phi)], -1))
        p = shadelib.specular_env_density(scene, idx, direction, normal,
                                          outer, w, cfg,
                                          roughness_fresnel=True,
                                          reflect_kill=True)
        integral = float(jnp.mean(p)) * 4 * np.pi

        # direct simulation of the same joint event (shading point at the
        # sphere's north pole, where the SDF normal is the assumed (0,1,0))
        u = rnglib.uniform4(jnp.arange(n, dtype=jnp.uint32), 0, 7, 1)
        pos = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)), jnp.float32)
        inter = shadelib.ray_surface_interaction(
            scene, idx, pos, direction, u, cfg,
            roughness_fresnel=True, reflect_kill=True)
        # P(reflect selected AND not killed) = mass of the raw density
        # restricted to above-surface reflections == the kill-variant
        # density's integral
        frac = float(jnp.mean((inter.reflect & ~inter.killed)))
        assert integral == pytest.approx(frac, rel=0.05), (integral, frac)


def test_gradient_through_nee():
    """scan-AD gradients flow through the NEE bank (albedo)."""
    from raytracingpbr_tpu.parallel import train as ptrain
    env_s = ibllib.with_env_sampler(sun_env())
    scene = sun_scene()
    cfg = base_cfg(resolution=(6, 6), max_raytrace=3, env_sampling=True)
    pid = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)

    def f(a):
        s = scene.replace(albedo=scene.albedo.at[1, 0].set(a))
        img = ptrain.render_pixels(s, env_s, CAM, pid, cfg, spp=2)
        return jnp.mean(img)

    g = float(jax.grad(f)(jnp.asarray(0.6)))
    assert np.isfinite(g) and g > 0


def test_replay_accepts_env_sampling():
    """Replay + NEE compose (VERDICT r3 item 6): the variance-reduced
    estimator and the deep-bounce gradient path work together (equivalence
    vs scan-AD is in tests/test_replay.py)."""
    env_s = ibllib.with_env_sampler(sun_env())
    scene = sun_scene()
    cfg = base_cfg(env_sampling=True, resolution=(6, 6), max_raytrace=4)

    def loss(sc):
        img = integ.render_image(sc, env_s, CAM, sc_cfg, spp=1,
                                 differentiable="replay", tonemapped=False)
        return jnp.mean(img)

    sc_cfg = cfg
    g = jax.grad(loss)(scene)
    assert np.isfinite(np.asarray(g.albedo)).all()
    assert float(jnp.abs(g.albedo).max()) > 0


def test_env_sampling_requires_baked_table():
    scene = sun_scene()
    cfg = base_cfg(env_sampling=True)
    with pytest.raises(ValueError):
        integ.render_image(scene, sun_env(), CAM, cfg, spp=1)
