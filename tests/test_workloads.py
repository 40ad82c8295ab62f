"""End-to-end workload smoke tests at reduced resolution: every reference
scene family renders finite, non-degenerate images; adaptive sampling gates
converged pixels; the interactive session honors the control protocol."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import bunny, cornell, demo
from raytracingpbr_tpu.ops import integrator as integ


def _finite_nonblack(img):
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.max() > 0.01
    return a


class TestWorkloads:
    def test_tokyo_ibl_render(self):
        cfg = demo.tokyo_config().replace(resolution=(48, 27),
                                          max_raymarch=96, max_raytrace=8)
        img = rt.render_image(demo.engine_scene(), demo.tokyo_environment(),
                              demo.engine_camera(), cfg, spp=2)
        _finite_nonblack(img)

    def test_scene_demo_gradient_sky(self):
        cfg = demo.scene_demo_config().replace(resolution=(48, 27),
                                               max_raymarch=96,
                                               max_raytrace=8)
        img = rt.render_image(demo.scene_demo_scene(),
                              demo.gradient_environment(),
                              demo.engine_camera(), cfg, spp=2)
        a = _finite_nonblack(img)
        assert a.mean() > 0.05  # bright procedural sky fills the background

    def test_bunny_metal_black_background(self):
        # black_background kills primary misses only; secondary rays pick up
        # the HDR environment (bunny_sdf.py:352, SURVEY.md §2.3.10)
        cfg = bunny.metal_config(scale=60).replace(max_raymarch=128,
                                                   max_raytrace=6)
        img = rt.render_image(bunny.metal_scene(),
                              bunny.glass_environment(),
                              bunny.camera(cfg.width / cfg.height), cfg,
                              spp=2)
        _finite_nonblack(img)

    def test_bunny_v2_white_background(self):
        cfg = bunny.v2_config(scale=60).replace(max_raymarch=128,
                                                max_raytrace=6)
        img = rt.render_image(bunny.glass_scene(), bunny.v2_environment(),
                              bunny.camera(cfg.width / cfg.height), cfg,
                              spp=2)
        a = _finite_nonblack(img)
        # white sky dominates the frame
        assert a.mean() > 0.3

    def test_cornell_v2_scaled_world(self):
        cfg = cornell.v2_config().replace(resolution=(32, 32),
                                          max_raymarch=96)
        cam = rt.make_camera(lookfrom=(0, 0, 30), lookat=(0, 0, 20),
                             vfov=43.6, aspect=1.0, aperture=0.01,
                             focus=4.0)
        img = rt.render_image(cornell.v2_scene(), cornell.sky(), cam, cfg,
                              spp=4, exposure=0.6)
        _finite_nonblack(img)

    def test_cornell_v3_config_renders(self):
        cfg = cornell.v3_config().replace(resolution=(32, 32),
                                          max_raymarch=96, max_raytrace=6)
        img = rt.render_image(cornell.full_scene(), cornell.sky(),
                              cornell.full_camera(), cfg, spp=2,
                              exposure=0.6)
        _finite_nonblack(img)


class TestAdaptiveSampling:
    def test_converged_pixels_stop_sampling(self):
        """SURVEY.md §2.3.13: the per-pixel noise estimate gates re-sampling.
        A black-sky scene with no geometry converges instantly -> after a few
        frames the noise metric drops below threshold and deposits stop."""
        # the running noise metric decays ~1/n for converged pixels
        # (diff_accum starts at (1,1), src/renderer.py:19), so a
        # CI-affordable threshold is 0.05 -> gating after ~20 frames
        cfg = rt.RenderConfig(resolution=(8, 8), max_raymarch=16,
                              adaptive_sampling=True, noise_threshold=0.05,
                              samples_per_frame=2)
        scene = rt.make_scene([rt.ObjectSpec(rt.SHAPE.SPHERE,
                                             position=(0, 0, -50),
                                             scale=(0.1, 0.1, 0.1))])
        env = rt.constant_sky((0.5, 0.5, 0.5))
        cam = rt.make_camera(lookfrom=(0, 0, 3), lookat=(0, 0, 4),
                             vfov=30.0, aspect=1.0, aperture=0.0, focus=1.0)
        state = make_frame_state(cfg.num_pixels)
        counts = []
        for _ in range(40):
            _, state = integ.render_frame(scene, env, cam, state, cfg)
            counts.append(float(np.asarray(state.accum)[:, 3].mean()))
        # deposits must plateau once the noise metric converges
        assert counts[-1] - counts[-4] < 1e-6, counts[-6:]
        assert counts[5] > 1  # but sampling did happen initially
        noise = np.asarray(state.noise)
        assert (noise <= cfg.noise_threshold).all()


class TestInteractive:
    def test_protocol_session(self, tmp_path):
        from raytracingpbr_tpu.apps.interactive import InteractiveSession
        cfg = cornell.minimal_config().replace(resolution=(16, 16),
                                               max_raymarch=32)
        sess = InteractiveSession(cornell.minimal_scene(), rt.white_sky(),
                                  cfg, out_dir=str(tmp_path),
                                  position=(0, 0, 3.5), lookat=(0, 0, -1))
        sess.step()
        vfov0, ap0 = sess.vfov, sess.aperture
        sess.run_commands(["w", "l", "z+", "x-", "v+", "g"])
        assert sess.vfov > vfov0
        assert sess.aperture < ap0
        assert sess.exposure > 1.0
        import os
        shots = [f for f in os.listdir(tmp_path) if f.startswith("shot_")]
        assert len(shots) == 1

    def test_motion_triggers_refresh(self, tmp_path):
        from raytracingpbr_tpu.apps.interactive import InteractiveSession
        cfg = cornell.minimal_config().replace(resolution=(8, 8),
                                               max_raymarch=32)
        sess = InteractiveSession(cornell.minimal_scene(), rt.white_sky(),
                                  cfg, out_dir=str(tmp_path))
        for _ in range(6):
            sess.step()
        settled = np.asarray(sess.state.accum)[:, 3].mean()
        sess.handle("w")  # move -> smooth camera reports moving -> refresh
        after = np.asarray(sess.state.accum)[:, 3].mean()
        assert after < settled
