"""Pallas fused-march kernel parity vs the XLA march (interpreter mode on
CPU; the TPU path is exercised by bench.py on hardware)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingpbr_tpu.config import HitCriterion, OmegaPolicy, RenderConfig
from raytracingpbr_tpu.models import cornell, demo
from raytracingpbr_tpu.ops import march as ml
from raytracingpbr_tpu.pallas import march_kernel as mk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (no TPU in CI)."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def rays_for(cfg, n=mk.TILE):
    rng = np.random.default_rng(0)
    o = np.tile([[0.0, 0.0, 3.5]], (n, 1)) + rng.normal(0, 0.2, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("scene_fn,cfg", [
    (cornell.minimal_scene, cornell.minimal_config()),
    (demo.engine_scene, demo.engine_config().replace(max_raymarch=128)),
])
def test_pallas_march_matches_xla(scene_fn, cfg):
    scene = scene_fn()
    o, d = rays_for(cfg)
    ref = ml.march(scene, o, d, cfg, differentiable=False)
    t, idx, hit, _ = mk.march_pallas(scene, o, d, cfg)
    h_ref = np.array(ref.hit)
    h_pl = np.array(hit)
    agree = (h_ref == h_pl)
    assert agree.mean() > 0.999, f"hit mismatch {1-agree.mean():.4%}"
    # f32 accumulation-order differences flip boundary decisions on a few
    # lanes of long marches; allow small relative slack
    np.testing.assert_allclose(np.array(t)[agree], np.array(ref.t)[agree],
                               rtol=1e-3, atol=1e-3)
    both_hit = h_ref & h_pl
    np.testing.assert_array_equal(np.array(idx)[both_hit],
                                  np.array(ref.index)[both_hit])


def test_pallas_march_padding():
    """Non-multiple-of-TILE batches are padded and unpadded correctly."""
    scene = cornell.minimal_scene()
    cfg = cornell.minimal_config()
    o, d = rays_for(cfg, n=777)
    t, idx, hit, _ = mk.march_pallas(scene, o, d, cfg)
    assert t.shape == (777,)
    ref = ml.march(scene, o, d, cfg, differentiable=False)
    agree = np.array(hit) == np.array(ref.hit)
    assert agree.mean() > 0.995


def test_pallas_bunny_matches_xla():
    """Neural-bunny MLP path in the kernel vs the XLA sd_bunny march."""
    from raytracingpbr_tpu.models import bunny as bunny_models
    scene = bunny_models.glass_scene()
    cfg = bunny_models.glass_config(scale=8).replace(max_raymarch=256)
    rng = np.random.default_rng(3)
    n = mk.TILE
    o = np.tile([[0.0, 0.0, 2.5]], (n, 1)) + rng.normal(0, 0.1, (n, 3))
    d = -o + rng.normal(0, 0.35, (n, 3))  # aim at the bunny, with spread
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    ref = ml.march(scene, o, d, cfg, differentiable=False, backend="xla")
    t, idx, hit, _ = mk.march_pallas(scene, o, d, cfg)
    h_ref, h_pl = np.array(ref.hit), np.array(hit)
    agree = h_ref == h_pl
    assert h_ref.mean() > 0.2  # sanity: a decent fraction hits the bunny
    assert agree.mean() > 0.99
    both = h_ref & h_pl
    np.testing.assert_allclose(np.array(t)[both], np.array(ref.t)[both],
                               rtol=2e-3, atol=2e-3)


def test_pallas_animated_scene_offset():
    """local_offset (animation) is honored by the packed kernel params."""
    from raytracingpbr_tpu.models import bunny as bunny_models
    from raytracingpbr_tpu.ops import scene as sc
    base = bunny_models.glass_scene()
    scene = sc.animate(base, jnp.asarray(60))
    cfg = bunny_models.glass_config(scale=8).replace(max_raymarch=256)
    o = jnp.tile(jnp.array([[0.0, 0.0, 2.5]]), (mk.TILE, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (mk.TILE, 1))
    ref = ml.march(scene, o, d, cfg, differentiable=False, backend="xla")
    t, idx, hit, _ = mk.march_pallas(scene, o, d, cfg)
    assert bool(np.array(hit)[0]) == bool(np.array(ref.hit)[0])
    np.testing.assert_allclose(float(t[0]), float(ref.t[0]), rtol=2e-3)


def test_pallas_march_active_gate():
    """Inactive lanes exit at iteration 0 and keep init outputs; active
    lanes match the ungated kernel exactly."""
    scene = cornell.minimal_scene()
    cfg = cornell.minimal_config()
    o, d = rays_for(cfg)
    full = mk.march_pallas(scene, o, d, cfg)
    active = jnp.asarray(np.arange(mk.TILE) % 3 != 0)
    t, idx, hit, _ = mk.march_pallas(scene, o, d, cfg, active=active)
    a = np.array(active)
    np.testing.assert_array_equal(np.array(hit)[a], np.array(full[2])[a])
    np.testing.assert_array_equal(np.array(t)[a], np.array(full[0])[a])
    assert not np.array(hit)[~a].any()
    np.testing.assert_allclose(np.array(t)[~a], cfg.march_t0)


@pytest.mark.parametrize("use_active", [False, True])
@pytest.mark.parametrize("family", ["minimal", "engine"])
def test_phased_march_bit_equal(use_active, family):
    """march_phased (compacted multi-phase) must return exactly what the
    single-shot kernel returns — same t/idx/hit AND the same per-lane
    convergence counts (the phase split carries exact loop state; the
    engine family exercises the w=1.6 rollback + CONE criterion whose
    w/s/d state must survive the phase boundary)."""
    if family == "minimal":
        scene = cornell.minimal_scene()
        cfg = cornell.minimal_config().replace(max_raymarch=256)
    else:
        scene = demo.engine_scene()
        cfg = demo.engine_config().replace(max_raymarch=128)
    assert len(mk.resolve_phases(cfg)) > 1
    o, d = rays_for(cfg, n=777)  # non-multiple-of-TILE exercises padding
    active = None
    if use_active:
        active = jnp.asarray(np.random.default_rng(1)
                             .random(777) < 0.7)
    t1, i1, h1, f1 = mk.march_pallas(scene, o, d, cfg, active=active)
    t2, i2, h2, f2 = mk.march_phased(scene, o, d, cfg, active=active)
    np.testing.assert_array_equal(np.array(h2), np.array(h1))
    np.testing.assert_array_equal(np.array(i2), np.array(i1))
    np.testing.assert_array_equal(np.array(t2), np.array(t1))
    np.testing.assert_array_equal(np.array(f2), np.array(f1))


def test_resolve_phases():
    base = cornell.minimal_config()
    assert mk.resolve_phases(base.replace(max_raymarch=64)) == (64,)
    assert mk.resolve_phases(base.replace(max_raymarch=512)) == \
        (32, 32, 64, 128, 256)
    assert mk.resolve_phases(base.replace(max_raymarch=2048)) == \
        (32, 32, 64, 128, 256, 512, 1024)
    assert mk.resolve_phases(base.replace(max_raymarch=100)) == (32, 32, 36)
    assert mk.resolve_phases(
        base.replace(max_raymarch=512, march_phases=(256, 256))) == (256, 256)
    with pytest.raises(ValueError):
        mk.resolve_phases(base.replace(max_raymarch=512,
                                       march_phases=(256, 128)))


def test_partition_active_stable():
    done = jnp.asarray([1, 0, 1, 0, 0, 1, 0], jnp.int32)
    perm = np.array(mk._partition_active(done))
    np.testing.assert_array_equal(perm, [1, 3, 4, 6, 0, 2, 5])
