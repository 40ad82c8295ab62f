"""Counter-RNG tests: determinism, uniformity, stream independence,
shard-layout invariance (SURVEY.md §7.4.4)."""
import jax.numpy as jnp
import numpy as np

from raytracingpbr_tpu.core import rng


def test_deterministic():
    pid = jnp.arange(1000, dtype=jnp.uint32)
    a = rng.uniform4(pid, 3, 1)
    b = rng.uniform4(pid, 3, 1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.array(x), np.array(y))


def test_uniform_moments():
    pid = jnp.arange(200_000, dtype=jnp.uint32)
    u = np.array(rng.uniform(pid, 0, 0))
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    assert u.min() >= 0.0 and u.max() < 1.0


def test_streams_and_steps_decorrelated():
    pid = jnp.arange(100_000, dtype=jnp.uint32)
    u0 = np.array(rng.uniform(pid, 0, 0))
    u1 = np.array(rng.uniform(pid, 0, 1))
    u2 = np.array(rng.uniform(pid, 1, 0))
    assert abs(np.corrcoef(u0, u1)[0, 1]) < 0.01
    assert abs(np.corrcoef(u0, u2)[0, 1]) < 0.01


def test_shard_invariance():
    """Draws depend only on the counter, not on how the batch is split."""
    pid = jnp.arange(4096, dtype=jnp.uint32)
    full = np.array(rng.uniform(pid, 7, 2))
    parts = [np.array(rng.uniform(pid[i::4], 7, 2)) for i in range(4)]
    for i in range(4):
        np.testing.assert_array_equal(full[i::4], parts[i])


def test_in_unit_disk():
    pid = jnp.arange(50_000, dtype=jnp.uint32)
    u1 = rng.uniform(pid, 0, 0)
    u2 = rng.uniform(pid, 0, 1)
    d = np.array(rng.in_unit_disk(u1, u2))
    r = np.linalg.norm(d, axis=-1)
    assert r.max() <= 1.0
    # area-uniform: mean radius = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.01


def test_in_unit_sphere_is_unit_directions():
    pid = jnp.arange(50_000, dtype=jnp.uint32)
    u1 = rng.uniform(pid, 0, 0)
    u2 = rng.uniform(pid, 0, 1)
    v = np.array(rng.in_unit_sphere(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # uniform on sphere: each component mean ~ 0
    assert np.abs(v.mean(0)).max() < 0.02


def test_hemispheric_cosine_weighted():
    pid = jnp.arange(100_000, dtype=jnp.uint32)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (100_000, 1))
    u1 = rng.uniform(pid, 0, 0)
    u2 = rng.uniform(pid, 0, 1)
    d = np.array(rng.hemispheric(n, u1, u2))
    cos = d[:, 2]
    assert (cos >= -1e-6).all()
    # cosine-weighted: E[cos] = 2/3
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


# --- R2 low-discrepancy sampler (reference ToDo src/util.py:64) -------------


def test_r2_range_and_determinism():
    pid = jnp.arange(4096, dtype=jnp.uint32)
    a = rng.r2_uniform4(pid, 7, 1)
    b = rng.r2_uniform4(pid, 7, 1)
    for x, y in zip(a, b):
        x, y = np.array(x), np.array(y)
        np.testing.assert_array_equal(x, y)
        assert x.min() >= 0.0 and x.max() < 1.0


def test_r2_stratifies_per_pixel_sequence():
    # For one pixel, the first 64 points of each dimension must be far more
    # evenly spread than iid uniforms: the three-gap theorem bounds the
    # largest gap of an additive recurrence; iid draws exceed this a.s.
    pid = jnp.zeros((1,), jnp.uint32)
    for dim in range(4):
        seq = np.array([
            float(rng.r2_uniform4(pid, n, 2, seed=5)[dim][0])
            for n in range(64)])
        # circular max gap: sort first, close the circle with min+1 (the
        # three-gap theorem bounds this for an additive recurrence; the worst
        # 1D projection of 4D R2 has alpha~0.857 with max gap ~0.117 at n=64,
        # while 64 iid uniforms exceed 0.15 with high probability).
        s = np.sort(seq)
        gaps = np.diff(np.concatenate([s, s[:1] + 1.0]))
        assert gaps.max() < 0.15, (dim, gaps.max())
        assert abs(seq.mean() - 0.5) < 0.03, (dim, seq.mean())


def test_r2_rotation_decorrelates_pixels_and_streams():
    pid = jnp.arange(50_000, dtype=jnp.uint32)
    u_s1 = np.array(rng.r2_uniform4(pid, 3, 1)[0])
    u_s2 = np.array(rng.r2_uniform4(pid, 3, 2)[0])
    assert abs(np.corrcoef(u_s1, u_s2)[0, 1]) < 0.01
    # across pixels at a fixed step the rotation is the only source of
    # variation — it must itself be uniform
    assert abs(u_s1.mean() - 0.5) < 0.01
    assert abs(u_s1.var() - 1.0 / 12.0) < 0.01


def test_r2_sampler_select():
    assert rng.sampler4(False) is rng.uniform4
    assert rng.sampler4(True) is rng.r2_uniform4
