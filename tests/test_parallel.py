"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
layout-invariance of the render, psum accumulation on the sample axis, and
the distributed inverse-rendering train step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import integrator as integ
from raytracingpbr_tpu.parallel import mesh as meshlib
from raytracingpbr_tpu.parallel import render as prender
from raytracingpbr_tpu.parallel import train as ptrain
from raytracingpbr_tpu.ops.scene import ObjectSpec
from raytracingpbr_tpu.ops.sdf import SHAPE


@pytest.fixture(scope="module")
def setup():
    w = h = 16
    cfg = cornell.minimal_config().replace(resolution=(w, h),
                                           max_raymarch=64)
    return (cornell.minimal_scene(), cornell.sky(),
            cornell.minimal_camera(), cfg)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_image_matches_single_device(setup):
    scene, env, cam, cfg = setup
    single = np.array(rt.render_image(scene, env, cam, cfg, spp=4,
                                      tonemapped=False))
    for tiles, samples in [(8, 1), (4, 2), (2, 4)]:
        mesh = meshlib.make_mesh(tiles=tiles, samples=samples)
        sharded = np.array(prender.render_image_sharded(
            scene, env, cam, cfg, mesh, spp=4, tonemapped=False))
        np.testing.assert_allclose(
            sharded, single, atol=1e-5, rtol=1e-4,
            err_msg=f"layout ({tiles},{samples}) diverged from single-device")


def test_sharded_wavefront_matches_single_device(setup):
    scene, env, cam, cfg = setup
    cfg = cfg.replace(samples_per_frame=2, max_raytrace=512,
                      quality_per_sample=0.8)
    n = cfg.num_pixels

    state_s = make_frame_state(n)
    single_fn = jax.jit(
        lambda st: integ.render_frame(scene, env, cam, st, cfg))
    px_single = None
    for _ in range(3):
        px_single, state_s = single_fn(state_s)

    mesh = meshlib.make_mesh(tiles=8, samples=1)
    state_m = prender.shard_frame_state(make_frame_state(n), mesh)
    # jit once — an unjitted shard_map closure re-lowers on every call
    shard_fn = jax.jit(lambda st: prender.render_frame_sharded(
        scene, env, cam, st, cfg, mesh))
    px_shard = None
    for _ in range(3):
        px_shard, state_m = shard_fn(state_m)
    np.testing.assert_allclose(np.array(px_shard), np.array(px_single),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.array(state_m.accum),
                               np.array(state_s.accum),
                               atol=1e-5, rtol=1e-4)


class TestDistributedTraining:
    def test_albedo_recovery(self):
        """Fit a sphere's albedo from a rendered target across the mesh:
        gradients psum over tiles+samples, optax update, loss decreases and
        albedo converges toward the truth."""
        w = h = 16
        cfg = rt.RenderConfig(
            resolution=(w, h), max_raymarch=48, max_raytrace=4,
            light_quality=1e9,
            roulette=rt.Roulette.EXP,
            omega=1.0, omega_policy=rt.OmegaPolicy.CONSTANT,
            hit_criterion=rt.HitCriterion.ABSOLUTE, hit_precision=1e-4,
            march_t0=0.005, max_dis=100.0)
        env = rt.white_sky()
        cam = rt.make_camera(lookfrom=(0, 0, 3), lookat=(0, 0, 0),
                             vfov=40.0, aspect=1.0, aperture=0.0, focus=1.0)

        def scene_with(albedo):
            return rt.make_scene([ObjectSpec(
                SHAPE.SPHERE, position=(0, 0, 0), scale=(1, 1, 1),
                albedo=albedo, roughness=1.0)])

        true_scene = scene_with((0.2, 0.6, 0.8))
        mesh = meshlib.make_mesh(tiles=4, samples=2)

        # target: noise-free-ish render with generous spp
        target = ptrain.render_pixels(
            true_scene, env, cam,
            jnp.arange(cfg.num_pixels, dtype=jnp.uint32), cfg, spp=8,
            sample_offset=jnp.uint32(10_000), differentiable=False)

        # albedo-only: materials are mutually compensating (emission x
        # albedo), so an unconstrained fit finds an image-equivalent but
        # different parameterization — freeze everything else.
        opt = optax.adam(optax.cosine_decay_schedule(0.08, 30, alpha=0.05))
        step = ptrain.make_sharded_train_step(
            env, cam, cfg, mesh, opt, spp=2,
            param_filter=ptrain.albedo_only_filter)
        ts = ptrain.make_train_state(scene_with((0.5, 0.5, 0.5)), opt)

        losses = []
        for _ in range(30):
            ts, loss = step(ts, target)
            losses.append(float(loss))
        assert np.mean(losses[-3:]) < losses[0] * 0.2
        rec = np.array(ts.scene.albedo)[0]
        np.testing.assert_allclose(rec, [0.2, 0.6, 0.8], atol=0.1)

    def test_gradients_identical_across_layouts(self):
        """The psum'd scene gradient must not depend on the mesh layout."""
        w = h = 8
        cfg = rt.RenderConfig(
            resolution=(w, h), max_raymarch=32, max_raytrace=2,
            light_quality=1e9, roulette=rt.Roulette.EXP,
            omega=1.0, omega_policy=rt.OmegaPolicy.CONSTANT,
            hit_criterion=rt.HitCriterion.ABSOLUTE, hit_precision=1e-4,
            march_t0=0.005, max_dis=100.0)
        env = rt.white_sky()
        cam = rt.make_camera(lookfrom=(0, 0, 3), lookat=(0, 0, 0),
                             vfov=40.0, aspect=1.0, aperture=0.0, focus=1.0)
        scene = rt.make_scene([ObjectSpec(
            SHAPE.SPHERE, position=(0, 0, 0), scale=(1, 1, 1),
            albedo=(0.5, 0.5, 0.5), roughness=1.0)])
        target = jnp.zeros((cfg.num_pixels, 3))
        opt = optax.sgd(0.0)

        grads = []
        for tiles, samples in [(8, 1), (2, 4)]:
            mesh = meshlib.make_mesh(tiles=tiles, samples=samples)
            # samples axis changes which sample ids each rank draws; use
            # samples=1-equivalent spp on both layouts for comparability:
            step = ptrain.make_sharded_train_step(env, cam, cfg, mesh, opt,
                                                  spp=1)
            ts = ptrain.make_train_state(scene, opt)
            _, loss = step(ts, target)
            grads.append(float(loss))
        # loss is pixel-MSE over the same pixels; sample axis splits sample
        # ids so estimates differ statistically but must be close
        assert abs(grads[0] - grads[1]) < 0.05
