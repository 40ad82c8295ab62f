"""Temporal reprojection (ops/reproject.py — the reference's ToDo at
src/renderer.py:22): projection inverse, identity warp, history preservation
under small camera motion, and integration with render_frame."""
import jax
import jax.numpy as jnp
import numpy as np

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.config import RenderConfig
from raytracingpbr_tpu.core.types import NO_HIT_T, make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.ops import reproject as rp


def _setup(w=24, h=24, **kw):
    cfg = cornell.minimal_config().replace(
        resolution=(w, h), max_raytrace=8, reprojection=True, **kw)
    return (cornell.minimal_scene(), cornell.sky(),
            cornell.minimal_camera(), cfg)


def _cam_with(cam, **kw):
    return cam.replace(**{k: jnp.asarray(v, jnp.float32)
                          for k, v in kw.items()})


def test_project_inverts_pixel_center_rays():
    scene, env, cam, cfg = _setup()
    ro, rd = rp.pixel_center_rays(cam, cfg)
    # points along each center ray must project back to their own pixel
    pts = ro + 2.5 * rd
    flat, valid = rp.project(cam, cfg, pts)
    assert bool(np.array(valid).all())
    np.testing.assert_array_equal(np.array(flat),
                                  np.arange(cfg.num_pixels))


def test_hit_t_records_primary_depth():
    scene, env, cam, cfg = _setup()
    state = make_frame_state(cfg.num_pixels)
    for _ in range(6):
        _, state = integ.render_frame(scene, env, cam, state, cfg)
    t = np.array(state.hit_t)
    # the cornell box is closed: every pixel's primary ray hits something
    assert (t < NO_HIT_T).all()
    assert (t > 0.1).all() and (t < 50.0).all()


def test_identity_reprojection_preserves_history():
    scene, env, cam, cfg = _setup()
    state = make_frame_state(cfg.num_pixels)
    for _ in range(6):
        _, state = integ.render_frame(scene, env, cam, state, cfg)
    warped = rp.reproject(state, cam, cam, cfg)
    a0 = np.array(state.accum)
    a1 = np.array(warped.accum)
    # same camera: every pixel maps to itself; history only rescaled by the
    # confidence factor (counts here are far below the cap)
    keep = a0[:, 3] > 0
    np.testing.assert_allclose(a1[keep], a0[keep] * cfg.reproject_confidence,
                               rtol=1e-5)
    # wavefront re-armed like refresh()
    assert (np.array(warped.rays.depth) == 0).all()


def test_small_motion_keeps_most_history():
    scene, env, cam, cfg = _setup()
    state = make_frame_state(cfg.num_pixels)
    for _ in range(6):
        _, state = integ.render_frame(scene, env, cam, state, cfg)
    cam2 = _cam_with(cam, lookfrom=np.array(cam.lookfrom) + [0.02, 0, 0],
                     lookat=np.array(cam.lookat) + [0.02, 0, 0])
    warped = rp.reproject(state, cam, cam2, cfg)
    total0 = float(np.array(state.accum)[:, 3].sum())
    total1 = float(np.array(warped.accum)[:, 3].sum())
    # most samples survive the warp (borders fall off), scaled by confidence
    assert total1 > 0.7 * cfg.reproject_confidence * total0
    assert total1 <= 1.001 * cfg.reproject_confidence * total0


def test_render_frame_reprojection_beats_zero_reset():
    """After a small camera move, one frame on the reprojected state is
    closer to the converged new view than one frame from scratch."""
    scene, env, cam, cfg = _setup(w=16, h=16)
    move = dict(lookfrom=np.array(cam.lookfrom) + [0.01, 0, 0],
                lookat=np.array(cam.lookat) + [0.01, 0, 0])
    cam2 = _cam_with(cam, **move)

    # converged target at the new view
    tgt = make_frame_state(cfg.num_pixels)
    for _ in range(40):
        _, tgt = integ.render_frame(scene, env, cam2, tgt, cfg)
    acc = np.array(tgt.accum)
    target = acc[:, :3] / np.maximum(acc[:, 3:4], 1.0)

    def mean_of(state):
        a = np.array(state.accum)
        return a[:, :3] / np.maximum(a[:, 3:4], 1.0)

    # history at the old view
    hist = make_frame_state(cfg.num_pixels)
    for _ in range(30):
        _, hist = integ.render_frame(scene, env, cam, hist, cfg)

    _, with_rp = integ.render_frame(scene, env, cam2, hist, cfg,
                                    refreshing=True, prev_cam=cam)
    _, from_zero = integ.render_frame(scene, env, cam2, hist,
                                      cfg.replace(reprojection=False),
                                      refreshing=True)
    err_rp = np.abs(mean_of(with_rp) - target).mean()
    err_zero = np.abs(mean_of(from_zero) - target).mean()
    assert err_rp < err_zero, (err_rp, err_zero)
