"""Adaptive frame-granularity compaction (ops/compact.py; round 5).

The wavefront must be lane-order-invariant: compacting the persistent
state actives-first mid-render (and rendering via render_frame_tile with
the permuted pixel-id map) must reproduce the uncompacted render's
per-pixel results bit-for-bit — only tile occupancy (execution time) may
change.
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytracingpbr_tpu.core.types import make_frame_state
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import compact as compactlib
from raytracingpbr_tpu.ops import integrator as integ


def _cfg():
    return cornell.full_config().replace(
        resolution=(32, 24), max_raymarch=64, max_raytrace=8,
        samples_per_frame=2, adaptive_sampling=True, noise_threshold=1e-2)


def test_pack_unpack_roundtrip():
    state = make_frame_state(96)
    state = state.replace(respawn=state.respawn + jnp.uint32(7),
                          march_cum=state.march_cum + 3)
    back = compactlib.unpack_state(compactlib.pack_state(state), state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compacted_render_bit_identical():
    cfg = _cfg()
    scene = cornell.full_scene()
    cam = cornell.full_camera()
    env = cornell.sky()
    n = cfg.num_pixels

    tile = jax.jit(lambda st, pid: integ.render_frame_tile(
        scene, env, cam, st, cfg, pid))

    # uncompacted reference
    state_a = make_frame_state(n)
    pid_a = jnp.arange(n, dtype=jnp.uint32)
    for _ in range(6):
        px_a, state_a = tile(state_a, pid_a)

    # compacted: recompact every other frame
    state_b = make_frame_state(n)
    pid_b = jnp.arange(n, dtype=jnp.uint32)
    for k in range(6):
        px_b, state_b = tile(state_b, pid_b)
        if k % 2 == 1:
            state_b, pid_b = compactlib.compact_frame_state(
                state_b, pid_b, cfg.noise_threshold)
    # actives lead after compaction
    act = np.asarray(state_b.noise > cfg.noise_threshold)
    assert act[: act.sum()].all()

    # per-pixel results identical: scatter B back to raster order
    raster_a = np.asarray(px_a)
    raster_b = compactlib.scatter_pixels(px_b, pid_b, cfg)
    np.testing.assert_array_equal(raster_b, raster_a)
    back = compactlib.uncompact_frame_state(state_b, pid_b)
    for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
