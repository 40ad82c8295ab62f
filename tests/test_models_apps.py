"""Scene-family builders, fly-cam math, app smoke tests (tiny CPU shapes)."""
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.models import bunny, cornell, demo
from raytracingpbr_tpu.ops import camera as cam
from raytracingpbr_tpu.ops.sdf import SHAPE


class TestSceneFamilies:
    def test_all_scene_builders(self):
        for fn in [cornell.minimal_scene, cornell.full_scene,
                   cornell.v2_scene, demo.engine_scene,
                   demo.scene_demo_scene, bunny.metal_scene,
                   bunny.glass_scene]:
            s = fn()
            assert s.num_objects >= 1
            assert s.position.shape == (s.num_objects, 3)

    def test_all_configs(self):
        for fn in [cornell.minimal_config, cornell.full_config,
                   cornell.v2_config, cornell.v3_config,
                   demo.engine_config, demo.scene_demo_config,
                   demo.tokyo_config, bunny.metal_config,
                   bunny.glass_config, bunny.v2_config]:
            cfg = fn()
            assert cfg.num_pixels > 0
            assert hash(cfg)  # static/jittable

    def test_reference_workload_matrix(self):
        """Resolutions/budgets pinned by BASELINE.md."""
        assert cornell.minimal_config().resolution == (512, 512)
        assert cornell.minimal_config().max_raytrace == 3
        assert cornell.full_config().resolution == (480, 480)
        assert cornell.full_config().max_raytrace == 128
        assert demo.engine_config().resolution == (768, 432)
        assert demo.tokyo_config().resolution == (2880, 1620)
        assert bunny.metal_config().resolution == (3840, 2160)
        assert bunny.glass_config().resolution == (1920, 1080)
        assert bunny.glass_config().samples_per_pixel == 512
        assert bunny.glass_config().max_raymarch == 2048

    def test_engine_scene_matches_reference_materials(self):
        s = demo.engine_scene()
        # sorted by type: spheres(1) x4 then cylinder(3) then boxes(2)
        assert s.shape_types == (1, 1, 1, 1, 2, 2, 3)
        # emissive sphere present with emission (1, 10, 1)
        em = np.array(s.emission)
        assert (em.max(0) == [1.0, 10.0, 1.0]).all()
        assert s.box_round == 0.03  # src/sdf.py:34

    def test_bunny_scene_has_mlp(self):
        s = bunny.glass_scene()
        assert s.bunny is not None
        assert s.shape_types == (int(SHAPE.BUNNY),)


class TestFlyCam:
    def test_vec_euler_roundtrip(self):
        for v in [(0, 0, 1), (1, 0, 0), (0.3, 0.5, -0.8)]:
            f = jnp.asarray(v, jnp.float32)
            f = f / jnp.linalg.norm(f)
            yaw, pitch = cam.vec_to_euler(f)
            back = cam.euler_to_vec(yaw, pitch)
            np.testing.assert_allclose(np.array(back), np.array(f),
                                       atol=1e-6)

    def test_fly_rotate_gimbal_clamp(self):
        pos = jnp.zeros(3)
        look = jnp.array([0.0, 0.0, 1.0])
        # crank pitch far beyond vertical: clamps near +pi/2, never flips
        new = cam.fly_rotate(pos, look, 0.0, 10.0)
        front = np.array(new - pos)
        assert front[1] < 1.0
        assert front[1] == pytest.approx(np.sin(np.pi / 2 * 0.999), rel=1e-4)

    def test_fly_rotate_yaw(self):
        pos = jnp.zeros(3)
        look = jnp.array([0.0, 0.0, 1.0])
        new = np.array(cam.fly_rotate(pos, look, jnp.pi / 2, 0.0))
        np.testing.assert_allclose(new, [-1.0, 0.0, 0.0], atol=1e-5)


class TestApps:
    def test_offline_animation_smoke(self, tmp_path):
        from raytracingpbr_tpu.apps.offline import render_animation
        base = bunny.glass_scene()
        cfg = bunny.glass_config(scale=60).replace(  # 32x18
            max_raymarch=48, max_raytrace=4, samples_per_pixel=1)
        env = rt.white_sky()
        camera = bunny.camera(cfg.width / cfg.height)
        render_animation(lambda f: bunny.animated_scene(base, f), env,
                         camera, cfg, frames=2, spp=1, out_dir=str(tmp_path))
        import os
        assert os.path.exists(tmp_path / "frame_00000.png")
        assert os.path.exists(tmp_path / "frame_00001.png")

    def test_progressive_daemon_smoke(self, tmp_path):
        from raytracingpbr_tpu.apps import progressive
        cfg = cornell.minimal_config().replace(resolution=(16, 16),
                                               max_raymarch=32)
        progressive.run(cornell.minimal_scene(), rt.white_sky(),
                        cornell.minimal_camera(), cfg, str(tmp_path),
                        minutes=0.02, save_every=5)
        import os
        assert os.path.exists(tmp_path / "final.png")
        assert os.path.exists(tmp_path / "state.npz")

    def test_denoise_demo_smoke(self):
        from raytracingpbr_tpu.apps.denoise_demo import run
        noisy, den = run(steps=5, resolution=(64, 32))
        assert den.shape == (32, 64, 3)
        # denoiser fills dropout holes: fewer near-black pixels than noisy
        lum_n = noisy.mean(-1)
        lum_d = den.mean(-1)
        assert (lum_d < 0.05).mean() <= (lum_n < 0.05).mean()


class TestValidate:
    def test_state_health_clean(self):
        from raytracingpbr_tpu.core.types import make_frame_state
        from raytracingpbr_tpu.utils import validate
        s = make_frame_state(64)
        h = validate.state_health(s)
        assert h["accum_finite_frac"] == 1.0
        validate.assert_state_finite(s)  # no raise

    def test_assert_catches_nan(self):
        import jax.numpy as jnp
        from raytracingpbr_tpu.core.types import make_frame_state
        from raytracingpbr_tpu.utils import validate
        s = make_frame_state(64)
        s = s.replace(accum=s.accum.at[0, 0].set(jnp.nan))
        with pytest.raises(FloatingPointError):
            validate.assert_state_finite(s)

    def test_progressive_debug_views(self, tmp_path):
        from raytracingpbr_tpu.apps import progressive
        cfg = cornell.minimal_config().replace(resolution=(8, 8),
                                               max_raymarch=16)
        progressive.run(cornell.minimal_scene(), rt.white_sky(),
                        cornell.minimal_camera(), cfg, str(tmp_path),
                        minutes=0.01, save_every=2, debug_views=True,
                        validate=True)
        import os
        assert os.path.exists(tmp_path / "debug_noise.png")
        assert os.path.exists(tmp_path / "debug_depth.png")

    def test_preview_server(self):
        """Live preview endpoint (apps/preview.py — the reference's
        canvas.set_image, src/main.py:64, over HTTP): page, frame, stats."""
        import json
        import urllib.request

        import numpy as np
        from raytracingpbr_tpu.apps.preview import PreviewServer

        srv = PreviewServer(0, host="127.0.0.1").start()
        try:
            img = np.zeros((12, 16, 3), np.float32)
            img[:, :, 0] = 1.0
            srv.update(img, frame=7, mean_spp=3.5)
            base = f"http://127.0.0.1:{srv.port}"
            page = urllib.request.urlopen(base + "/", timeout=5).read()
            assert b"<img" in page
            r = urllib.request.urlopen(base + "/frame.png", timeout=5)
            body = r.read()
            assert r.headers["Content-Type"] == "image/png"
            assert body.startswith(b"\x89PNG")
            stats = json.loads(urllib.request.urlopen(
                base + "/stats", timeout=5).read())
            assert stats["frame"] == 7
        finally:
            srv.stop()

    def test_encode_png_roundtrip(self, tmp_path):
        import numpy as np
        from raytracingpbr_tpu.io import image as imageio
        rng = np.random.default_rng(3)
        img = rng.random((9, 13, 3)).astype(np.float32)
        data = imageio.encode_png(img)
        p = tmp_path / "x.png"
        p.write_bytes(data)
        back = imageio.read_png(str(p))
        np.testing.assert_array_equal(
            back, (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8))

    def test_progressive_serve_smoke(self, tmp_path):
        """--serve end-to-end: the daemon publishes frames while rendering."""
        import urllib.request

        from raytracingpbr_tpu.apps import progressive
        from raytracingpbr_tpu.apps import preview as previewlib

        captured = {}
        orig_start = previewlib.PreviewServer.start

        def capture_start(self):
            out = orig_start(self)
            captured["srv"] = self
            return out
        previewlib.PreviewServer.start = capture_start
        try:
            cfg = cornell.minimal_config().replace(resolution=(8, 8),
                                                   max_raymarch=16)
            progressive.run(cornell.minimal_scene(), rt.white_sky(),
                            cornell.minimal_camera(), cfg, str(tmp_path),
                            minutes=0.01, save_every=2, serve=0)
            srv = captured["srv"]
            # server was stopped at run() end; frame must have been published
            assert srv._png is not None and srv._png.startswith(b"\x89PNG")
            assert srv._stats.get("frame", 0) > 0
        finally:
            previewlib.PreviewServer.start = orig_start
