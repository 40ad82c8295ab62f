"""Integrator tests: numpy-oracle parity, energy conservation (furnace),
wavefront vs megakernel agreement, progressive accumulation semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.config import RenderConfig
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.ops.scene import ObjectSpec
from raytracingpbr_tpu.ops.sdf import SHAPE

from .oracle import OracleCornell


class TestOracleParity:
    """The vectorized engine must match a from-scratch sequential numpy
    implementation draw-for-draw (counter RNG makes this exact)."""

    def test_minimal_cornell_matches_numpy_oracle(self):
        w = h = 24
        spp = 2
        cfg = cornell.minimal_config().replace(resolution=(w, h))
        scene = cornell.minimal_scene()
        cam = cornell.minimal_camera()
        env = cornell.sky()
        img = np.array(rt.render_image(scene, env, cam, cfg, spp=spp,
                                       diffuse_only=True, tonemapped=False))
        oracle = OracleCornell(w, h).render(spp)
        close = np.isclose(img, oracle, atol=2e-3, rtol=1e-3)
        frac = close.mean()
        # tie-breaks in argmin/argmax may flip a handful of paths; demand
        # near-total agreement plus tight mean agreement
        assert frac > 0.98, f"only {frac:.3%} of pixels match the oracle"
        assert abs(img.mean() - oracle.mean()) < 2e-3


def furnace_scene(albedo=1.0):
    return rt.make_scene([ObjectSpec(SHAPE.SPHERE, position=(0, 0, 0),
                                     scale=(1, 1, 1),
                                     albedo=(albedo,) * 3,
                                     roughness=1.0)])


class TestFurnace:
    """White-furnace: a perfectly diffuse white sphere in a unit-radiance
    environment must render to exactly 1 in expectation — validates BSDF
    normalization + integrator bookkeeping end-to-end."""

    def test_wavefront_energy_conservation(self):
        w = h = 32
        cfg = RenderConfig(resolution=(w, h), max_raymarch=128,
                           samples_per_frame=4)
        scene = furnace_scene()
        env = rt.white_sky()
        cam = rt.make_camera(lookfrom=(0, 0, 3), lookat=(0, 0, 0),
                             vfov=50.0, aspect=1.0, aperture=0.0, focus=1.0)
        state = make_frame_state(cfg.num_pixels)

        @jax.jit
        def frame(st):
            return integ.render_frame(scene, env, cam, st, cfg)

        for _ in range(60):
            _, state = frame(state)
        mean_linear = np.array(state.accum)
        counts = mean_linear[:, 3]
        assert counts.min() >= 1
        value = (mean_linear[:, :3].sum(0) / counts.sum())
        np.testing.assert_allclose(value, 1.0, atol=0.03)

    def test_megakernel_near_unity(self):
        # EXP roulette (the examples' own scheme) is slightly lossy: the
        # killed lane deposits color*prob instead of dividing survivors —
        # expect just under 1 (SURVEY.md §2.3.8 notes the two flavors).
        w = h = 32
        cfg = cornell.minimal_config().replace(
            resolution=(w, h), max_raymarch=128)
        scene = furnace_scene()
        env = rt.white_sky()
        cam = rt.make_camera(lookfrom=(0, 0, 3), lookat=(0, 0, 0),
                             vfov=50.0, aspect=1.0, aperture=0.0, focus=1.0)
        img = np.array(rt.render_image(scene, env, cam, cfg, spp=16,
                                       diffuse_only=True, tonemapped=False))
        assert 0.93 < img.mean() < 1.005


def test_wavefront_matches_megakernel_mean():
    """Both integrators are unbiased estimators of the same integral when
    given the same BSDF: megakernel with roulette disabled
    (light_quality -> inf makes the EXP kill probability ~0, removing its
    kill-deposit bias, SURVEY.md §2.3.8) vs the wavefront's depth-linear
    RR (which divides survivors — unbiased by construction)."""
    w = h = 32
    scene = cornell.minimal_scene()
    cam = cornell.minimal_camera()
    env = cornell.sky()
    mcfg = cornell.minimal_config().replace(
        resolution=(w, h), max_raytrace=24, light_quality=1e9)
    mega = np.array(rt.render_image(
        scene, env, cam, mcfg, spp=48, tonemapped=False,
        roughness_fresnel=False, restart_at_hit=False))

    wcfg = mcfg.replace(samples_per_frame=8, max_raytrace=512,
                        quality_per_sample=0.8)
    state = make_frame_state(wcfg.num_pixels)

    @jax.jit
    def frame(st):
        return integ.render_frame(scene, env, cam, st, wcfg)

    for _ in range(48):
        _, state = frame(state)
    acc = np.array(state.accum)
    wave = acc[:, :3] / acc[:, 3:4]
    wave_img = wave.reshape(w, h, 3).transpose(1, 0, 2)[::-1]
    # compare low-frequency content: 8x8 block means. A 100x emitter makes
    # per-block absolute tolerances meaningless at CPU-affordable sample
    # counts, so assert structural agreement (correlation) + total energy.
    mb = mega.reshape(8, w // 8, 8, h // 8, 3).mean((1, 3)).ravel()
    wb = wave_img.reshape(8, w // 8, 8, h // 8, 3).mean((1, 3)).ravel()
    assert np.corrcoef(mb, wb)[0, 1] > 0.99
    assert 0.95 < wave_img.sum() / mega.sum() < 1.05
    assert abs(wave_img.mean() - mega.mean()) < 0.03


class TestFrameSemantics:
    def test_accum_counts_grow(self):
        cfg = RenderConfig(resolution=(16, 16), max_raymarch=64,
                           samples_per_frame=2)
        scene = furnace_scene()
        env = rt.white_sky()
        cam = rt.make_camera(aspect=1.0)
        state = make_frame_state(cfg.num_pixels)
        for _ in range(10):
            _, state = integ.render_frame(scene, env, cam, state, cfg)
        counts = np.array(state.accum[:, 3])
        assert counts.mean() > 2  # paths complete and deposit
        assert int(state.frame) == 10

    def test_refresh_resets_accum_not_rng(self):
        cfg = RenderConfig(resolution=(16, 16), max_raymarch=64)
        scene = furnace_scene()
        env = rt.white_sky()
        cam = rt.make_camera(aspect=1.0)
        state = make_frame_state(cfg.num_pixels)
        for _ in range(5):
            _, state = integ.render_frame(scene, env, cam, state, cfg)
        px_a, state_a = integ.render_frame(scene, env, cam, state, cfg,
                                           refreshing=True)
        # accumulator restarted: counts small again
        assert np.array(state_a.accum)[:, 3].max() <= 1
        # frame counter monotone (RNG never reuses counters)
        assert int(state_a.frame) == 6

    def test_deterministic_given_state(self):
        cfg = RenderConfig(resolution=(8, 8), max_raymarch=64)
        scene = furnace_scene()
        env = rt.white_sky()
        cam = rt.make_camera(aspect=1.0)
        s0 = make_frame_state(cfg.num_pixels)
        a, _ = integ.render_frame(scene, env, cam, s0, cfg)
        b, _ = integ.render_frame(scene, env, cam, s0, cfg)
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_black_background_kills_primary_miss_only():
    cfg = RenderConfig(resolution=(8, 8), max_raymarch=32,
                       black_background=True)
    scene = furnace_scene()
    env = rt.constant_sky((5.0, 5.0, 5.0))
    # camera looking away from the sphere: every primary ray misses
    cam = rt.make_camera(lookfrom=(0, 0, 3), lookat=(0, 0, 6), vfov=30.0,
                         aspect=1.0, aperture=0.0, focus=1.0)
    state = make_frame_state(cfg.num_pixels)
    for _ in range(4):
        _, state = integ.render_frame(scene, env, cam, state, cfg)
    acc = np.array(state.accum)
    deposited = acc[:, :3].sum()
    assert deposited == pytest.approx(0.0, abs=1e-6)


class TestLowDiscrepancyWavefront:
    """The wavefront integrator indexes the R2 camera sampler with the
    per-pixel respawn counter (FrameState.respawn), not the global step —
    a pixel consumes a camera draw only on steps where its path finished
    (ADVICE round-1, medium)."""

    def _setup(self, ld):
        cfg = RenderConfig(resolution=(16, 16), max_raymarch=64,
                           samples_per_frame=2, low_discrepancy=ld)
        scene = furnace_scene()
        env = rt.white_sky()
        cam = rt.make_camera(aspect=1.0)
        return scene, env, cam, cfg

    def test_respawn_counts_deposits(self):
        scene, env, cam, cfg = self._setup(True)
        state = make_frame_state(cfg.num_pixels)
        for _ in range(12):
            _, state = integ.render_frame(scene, env, cam, state, cfg)
        respawn = np.array(state.respawn)
        counts = np.array(state.accum[:, 3])
        # every deposited sample came from a consumed camera draw; the
        # in-flight path may hold one more draw than it has deposited
        assert (respawn >= counts).all()
        assert (respawn <= counts + 1).all()
        # refresh restarts the R2 prefix
        _, state = integ.render_frame(scene, env, cam, state, cfg,
                                      refreshing=True)
        assert np.array(state.respawn).max() <= 2 * cfg.samples_per_frame

    def test_ld_unbiased_vs_uniform(self):
        # same furnace, both samplers must converge to 1
        scene, env, cam, cfg = self._setup(True)
        state = make_frame_state(cfg.num_pixels)
        for _ in range(40):
            _, state = integ.render_frame(scene, env, cam, state, cfg)
        acc = np.array(state.accum)
        value = acc[:, :3].sum(0) / acc[:, 3].sum()
        np.testing.assert_allclose(value, 1.0, atol=0.04)


def test_cornell_wall_radiance_matches_theory():
    """Global-illumination energy regression: the back-wall *center* of the
    full-PBR cornell box converges to ~0.43 linear radiance (direct light
    from the 100x emitter ~0.35 by the area-light estimate with the 82.5%
    diffuse lobe fraction, plus GI; insensitive to bounce budget beyond ~8
    since wall albedo is 0.4). 4096 iid paths give SE ~0.065. Guards
    against silent energy loss in the emission/termination/roulette chain."""
    from raytracingpbr_tpu.core.types import Rays

    scene = cornell.full_scene()
    cfg = cornell.full_config().replace(max_raytrace=24)
    env = cornell.sky()
    n = 4096
    o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    rays = Rays(origin=o, direction=d, color=jnp.ones((n, 3)),
                depth=jnp.zeros((n,), jnp.int32))
    pid = jnp.arange(n, dtype=jnp.uint32)  # distinct counters = iid samples
    out = integ.megakernel_trace(scene, env, rays, pid, 0, cfg)
    mean = float(np.array(out.color).mean())
    assert 0.30 < mean < 0.58, mean


def test_render_image_progressive_matches_megakernel_energy():
    """Wavefront-based still (render_image_progressive) agrees with the
    megakernel still on low-frequency content — the fast offline path."""
    w = h = 32
    scene = cornell.minimal_scene()
    cam = cornell.minimal_camera()
    env = cornell.sky()
    mcfg = cornell.minimal_config().replace(
        resolution=(w, h), max_raytrace=24, light_quality=1e9)
    mega = np.array(rt.render_image(
        scene, env, cam, mcfg, spp=32, tonemapped=False,
        roughness_fresnel=False, restart_at_hit=False))
    wcfg = mcfg.replace(samples_per_frame=8, max_raytrace=512,
                        quality_per_sample=0.8)
    img, state = integ.render_image_progressive(
        scene, env, cam, wcfg, spp=32, tonemapped=False)
    img = np.array(img)
    assert img.shape == (h, w, 3)
    assert float(np.array(state.accum)[:, 3].min()) >= 32
    mb = mega.reshape(8, w // 8, 8, h // 8, 3).mean((1, 3)).ravel()
    wb = img.reshape(8, w // 8, 8, h // 8, 3).mean((1, 3)).ravel()
    assert np.corrcoef(mb, wb)[0, 1] > 0.98
    assert 0.9 < img.sum() / mega.sum() < 1.1
