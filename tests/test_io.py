"""Native IO codec + checkpoint tests."""
import os

import jax
import numpy as np
import pytest

from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.io import checkpoint as ckpt
from raytracingpbr_tpu.io import image as imageio


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    imageio.write_png(p, img)
    back = imageio.read_png(p)
    u8 = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, u8)


def test_png_numpy_fallback_matches_native(tmp_path):
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    imageio.write_png(p1, u8)
    imageio._write_png_numpy(p2, u8)
    np.testing.assert_array_equal(imageio.read_png(p1), imageio.read_png(p2))


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    # per-pixel dynamic range (RGBE has a shared exponent per pixel)
    hdr = (rng.uniform(0.05, 1, (24, 48, 3))
           * rng.choice([0.01, 1.0, 100.0], (24, 48, 1))).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    imageio.write_hdr(p, hdr)
    back = imageio.read_hdr(p)
    bound = hdr.max(-1, keepdims=True) / 128
    assert (np.abs(back - hdr) <= bound).all()


def test_hdr_env_layout():
    img = np.zeros((2, 4, 3), np.float32)
    img[0, 1] = 7.0  # top row, x=1
    env = imageio.hdr_to_env_layout(img)
    assert env.shape == (4, 2, 3)
    # top row becomes y = h-1 (y up)
    np.testing.assert_allclose(env[1, 1], 7.0)


class TestCheckpoint:
    def test_roundtrip_bit_exact(self, tmp_path):
        state = make_frame_state(64)
        state = state.replace(
            accum=state.accum + np.pi, frame=state.frame + 17)
        p = str(tmp_path / "ck.npz")
        ckpt.save(p, state, meta={"note": "x"})
        back, meta = ckpt.load(p)
        assert meta == {"note": "x"}
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_identically(self, tmp_path):
        """Render k frames, checkpoint, render k more; equals 2k straight —
        the bit-exact-resume property (SURVEY.md §5 Checkpoint/resume)."""
        import raytracingpbr_tpu as rt
        from raytracingpbr_tpu.models import cornell
        from raytracingpbr_tpu.ops import integrator as integ

        cfg = cornell.minimal_config().replace(resolution=(8, 8),
                                               max_raymarch=32)
        scene = cornell.minimal_scene()
        env = rt.white_sky()
        cam = cornell.minimal_camera()

        s = make_frame_state(cfg.num_pixels)
        for _ in range(4):
            _, s = integ.render_frame(scene, env, cam, s, cfg)
        straight = s

        s2 = make_frame_state(cfg.num_pixels)
        for _ in range(2):
            _, s2 = integ.render_frame(scene, env, cam, s2, cfg)
        p = str(tmp_path / "mid.npz")
        ckpt.save(p, s2)
        resumed, _ = ckpt.load(p)
        resumed = jax.tree.map(lambda x: jax.numpy.asarray(x), resumed)
        for _ in range(2):
            _, resumed = integ.render_frame(scene, env, cam, resumed, cfg)
        np.testing.assert_array_equal(np.asarray(straight.accum),
                                      np.asarray(resumed.accum))
