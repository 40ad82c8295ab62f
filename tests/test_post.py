"""Postprocess tests (reference: src/postprocessor.py, src/aces.py,
examples/denoise)."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.config import RenderConfig, Tonemap
from raytracingpbr_tpu.ops import post


def test_rrt_odt_fit_closed_form():
    v = 0.5
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    out = float(post.rrt_and_odt_fit(jnp.asarray(v)))
    assert out == pytest.approx(a / b, rel=1e-6)


def test_aces_matrices_applied_as_mat_vec():
    rgb = jnp.array([0.3, 0.5, 0.2])
    manual = np.array(post.ACES_INPUT) @ np.array(rgb)
    manual = np.array(post.rrt_and_odt_fit(jnp.asarray(manual)))
    manual = np.array(post.ACES_OUTPUT) @ manual
    np.testing.assert_allclose(np.array(post.aces_fitted(rgb)), manual,
                               rtol=1e-5)


def test_aces_maps_white_near_one():
    out = np.array(post.aces_fitted(jnp.array([10.0, 10.0, 10.0])))
    assert (out > 0.95).all() and (out < 1.2).all()


def test_average_uses_alpha_count():
    accum = jnp.array([[2.0, 4.0, 6.0, 2.0], [0.0, 0.0, 0.0, 0.0]])
    out = np.array(post.average(accum))
    np.testing.assert_allclose(out[0], [1, 2, 3])
    np.testing.assert_allclose(out[1], 0.0)  # no samples -> black, not NaN


def test_tonemap_orderings_differ():
    cfg_a = RenderConfig(tonemap=Tonemap.GAMMA_THEN_ACES)
    cfg_b = RenderConfig(tonemap=Tonemap.ACES_THEN_GAMMA)
    rgb = jnp.array([[0.2, 0.4, 0.6]])
    a = np.array(post.tonemap(rgb, cfg_a))
    b = np.array(post.tonemap(rgb, cfg_b))
    assert not np.allclose(a, b)
    assert (a >= 0).all() and (a <= 1).all()
    assert (b >= 0).all() and (b <= 1).all()


def test_gamma_then_aces_matches_reference_order():
    """src/postprocessor.py:24-38: mean -> exposure -> pow(1/g) -> ACES."""
    cfg = RenderConfig(tonemap=Tonemap.GAMMA_THEN_ACES, clamp_output=False)
    rgb = jnp.array([[0.2, 0.4, 0.6]])
    expected = post.aces_fitted((rgb * 1.0) ** (1 / 2.2))
    np.testing.assert_allclose(np.array(post.tonemap(rgb, cfg)),
                               np.array(expected), rtol=1e-5)


def test_adaptive_noise_metric():
    cfg = RenderConfig(adaptive_sampling=True)
    accum = jnp.ones((4, 4))  # rgb=1, count=1
    last = jnp.zeros((4, 3))
    diff0 = jnp.ones((4, 2))
    pixels, diff, noise = post.post_process(accum, cfg, 1.0, last, diff0)
    assert noise is not None
    # diff accumulates (brightness(|new - last|), 1)
    np.testing.assert_allclose(np.array(diff)[:, 1], 2.0)
    assert (np.array(noise) > 0).all()


def test_denoise_fills_dark_holes():
    img = np.full((8, 8, 3), 0.8, np.float32)
    img[4, 4] = 0.0  # hole
    out = np.array(post.denoise(jnp.asarray(img), jnp.asarray(img),
                                threshold=0.2))
    assert out[4, 4].mean() == pytest.approx(0.8, rel=1e-5)
    # non-hole pixels keep the blend
    assert out[2, 2].mean() == pytest.approx(0.8, rel=1e-5)


def test_dropout_noise_unbiased():
    rng = np.random.default_rng(0)
    px = jnp.ones((20000, 3))
    u = jnp.asarray(rng.uniform(size=20000), jnp.float32)
    noisy = np.array(post.inject_dropout_noise(px, u, keep=0.5))
    assert noisy.mean() == pytest.approx(1.0, abs=0.02)
    assert set(np.unique(noisy.round(3))) == {0.0, 2.0}
