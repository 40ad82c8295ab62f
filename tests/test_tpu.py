"""Hardware gate: Mosaic-compiled behavior on the REAL chip.

Every other test in this suite runs on the CPU stand-in (8 virtual
devices, Pallas in interpreter mode) — which is exactly how the round-3
march-compaction regression shipped: bit-equality held in the interpreter
while the same default was 53x slower Mosaic-compiled (VERDICT r3 weak 1/5).
This subset runs in minutes on the chip and fails if:

* the Pallas march's Mosaic-compiled numerics drift from the XLA march,
* the phased (compacted) march stops being bit-equal to single-shot, or
* wavefront throughput falls below HALF the recorded capability
  (floor 5 Msamples/s vs ~11 measured, tools/probe_phased.py r4) — any
  future default that regresses >2x trips this before it can ship.

Run: ``RT_TPU=1 python -m pytest tests/test_tpu.py -m tpu -v``
(skipped automatically in the CPU suite).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

from raytracingpbr_tpu.core import rng as rnglib  # noqa: E402
from raytracingpbr_tpu.core.types import make_frame_state  # noqa: E402
from raytracingpbr_tpu.models import cornell  # noqa: E402
from raytracingpbr_tpu.ops import camera as cameralib  # noqa: E402
from raytracingpbr_tpu.ops import integrator as integ  # noqa: E402
from raytracingpbr_tpu.ops import march as ml  # noqa: E402
from raytracingpbr_tpu.pallas import march_kernel as mk  # noqa: E402

# The measured wavefront capability is ~11 Msamples/s (tools/probe_phased.py,
# round 4, TPU v5e). Floor at less than half: a default that regresses >2x
# fails here BEFORE a round ships it (the r3 regression was 24x).
WAVEFRONT_FLOOR_MSPS = 5.0


@pytest.fixture(scope="module")
def cornell_setup():
    scene = cornell.full_scene()
    cfg = cornell.full_config()
    cam = cornell.full_camera()
    env = cornell.sky()
    n = cfg.num_pixels
    pid = jnp.arange(n, dtype=jnp.uint32)
    u = rnglib.uniform4(pid, 0, 1, cfg.seed)
    uv = cameralib.pixel_uv(pid, cfg.width, cfg.height, u[0], u[1])
    primary = cameralib.get_ray(cam, uv, u[2], u[3])
    return scene, cfg, cam, env, primary


def _mixed_state(scene, cfg, cam, env):
    """A realistically divergent wavefront state: two frames in."""
    state = make_frame_state(cfg.num_pixels)
    step = jax.jit(lambda st: integ.render_frame(
        scene, env, cam, st,
        cfg.replace(samples_per_frame=3, march_compaction=False)))
    _, state = step(state)
    _, state = step(state)
    return state.rays


def test_pallas_march_matches_xla_on_chip(cornell_setup):
    """Mosaic-compiled kernel numerics vs the XLA march (the CPU suite only
    ever checks the interpreter; this asserts the chip)."""
    scene, cfg, cam, env, primary = cornell_setup
    o, d = primary.origin, primary.direction
    ref = ml.march(scene, o, d, cfg, differentiable=False, backend="xla")
    t, idx, hit, _ = jax.jit(
        lambda o, d: mk.march_pallas(scene, o, d, cfg))(o, d)
    h_ref, h_pl = np.asarray(ref.hit), np.asarray(hit)
    agree = h_ref == h_pl
    assert agree.mean() > 0.999, f"hit mismatch {1 - agree.mean():.4%}"
    np.testing.assert_allclose(np.asarray(t)[agree],
                               np.asarray(ref.t)[agree],
                               rtol=1e-3, atol=1e-3)
    both = h_ref & h_pl
    np.testing.assert_array_equal(np.asarray(idx)[both],
                                  np.asarray(ref.index)[both])


def test_phased_march_bit_equal_on_chip(cornell_setup):
    """march_phased == march_pallas bit-for-bit, Mosaic-compiled, on both a
    coherent primary batch and a divergent mixed wavefront state."""
    scene, cfg, cam, env, primary = cornell_setup
    mixed = _mixed_state(scene, cfg, cam, env)
    for rays in (primary, mixed):
        o, d = rays.origin, rays.direction
        a = jax.jit(lambda o, d: mk.march_pallas(scene, o, d, cfg))(o, d)
        b = jax.jit(lambda o, d: mk.march_phased(scene, o, d, cfg))(o, d)
        for i, lbl in ((0, "t"), (1, "idx"), (2, "hit")):
            np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b[i]),
                                          err_msg=f"phased {lbl} mismatch")


@pytest.mark.parametrize("name", ["cornell_full", "bunny_metal"])
def test_tpu_render_matches_cpu_golden(name):
    """End-to-end image on the REAL chip vs the CPU-generated golden.

    Covers the full TPU numerics stack — Mosaic-compiled Pallas march
    (incl. the bunny MLP's MXU matmuls), XLA shading/post — against the
    same deterministic render on CPU. The r4 bf16 matmul-precision bug
    (DEFAULT TPU matmul truncating f32 SDF rotations) scored far below any
    gate here; with full-precision contractions TPU-vs-CPU drift is
    reassociation-level. Gate 30 dB (vs the CPU suite's 35: the
    Pallas-vs-XLA march boundary flips a few boundary pixels)."""
    import os

    import numpy as np

    from raytracingpbr_tpu.io import image as imageio
    from raytracingpbr_tpu.utils.metrics import psnr

    from .golden_specs import render_golden

    golden_dir = os.path.join(os.path.dirname(__file__), "..", "assets",
                              "goldens")
    path = os.path.join(golden_dir, f"{name}.png")
    assert os.path.exists(path), f"golden {path} missing"
    img = render_golden(name)
    gold = imageio.read_png(path)[..., :3]
    got = (np.clip(np.asarray(img), 0, 1) * 255 + 0.5).astype(np.uint8)
    assert got.shape == gold.shape
    db = psnr(got, gold)
    assert db >= 30.0, f"{name} on TPU: PSNR {db:.2f} dB vs CPU golden"


def test_split_march_resume_bit_equal_on_chip(cornell_setup):
    """Mosaic has_init path: chained budget-capped marches reproduce the
    single uninterrupted march bit-for-bit on the real chip (the property
    cfg.march_split rests on; CPU/interpreter version in
    tests/test_split_march.py)."""
    import jax.numpy as jnp

    from raytracingpbr_tpu.ops import march as marchlib

    scene, cfg, cam, env, primary = cornell_setup
    c = cfg.replace(max_raymarch=128)
    o, d = primary.origin, primary.direction
    ref = marchlib.march(scene, o, d, c, differentiable=False,
                         backend="pallas")
    B = 32
    n = o.shape[0]
    t = jnp.full((n,), c.march_t0)
    w = jnp.full((n,), c.omega)
    s = jnp.zeros((n,))
    dd = jnp.full((n,), 1e3)
    cum = jnp.zeros((n,), jnp.int32)
    idx = jnp.zeros((n,), jnp.int32)
    hit = jnp.zeros((n,), bool)
    live = jnp.ones((n,), bool)
    mcfg = c.replace(max_raymarch=B)
    for _ in range(c.max_raymarch // B):
        rr = marchlib.march_resumable(scene, o, d, mcfg, active=live,
                                      init=(t, w, s, dd),
                                      backend="pallas")
        cum = cum + rr.fin
        done_now = live & ((rr.done > 0) | (cum >= c.max_raymarch))
        idx = jnp.where(live, rr.index, idx)
        hit = jnp.where(live, rr.hit, hit)
        t = jnp.where(live, rr.t, t)
        w = jnp.where(live, rr.w, w)
        s = jnp.where(live, rr.s, s)
        dd = jnp.where(live, rr.d, dd)
        live = live & ~done_now
    np.testing.assert_array_equal(np.asarray(t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref.hit))
    both = np.asarray(hit) & np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(idx)[both],
                                  np.asarray(ref.index)[both])


# --- estimator-quality floors (VERDICT r4 item 7): the r4 quality claims
# lived only in one-off tool outputs; these gate them on hardware. ---

# Equal-time NEE advantage on the sun-lit bench_nee scene was measured at
# ~16 dB (SCALING.md r4); floor at 8 dB — a broken alias sampler, MIS
# weight, or shadow march drops this to ~0.
NEE_EQUAL_TIME_DB_FLOOR = 8.0
# Reference-golden block correlation was 0.962 at 768 spp (PARITY.md r4);
# at the cheaper in-gate spp it measures slightly lower — floor 0.93.
PARITY_BLOCK_CORR_FLOOR = 0.93
# replay+NEE backward throughput (bench.py extras). r4: 0.433 Msps; the r5
# one-hot/two-level env-table fetches lift it to 1.12 (the tax was
# gather-bound env sampling, not the shadow march —
# tools/probe_replay_nee.py). Floor tolerates chip-state jitter.
REPLAY_NEE_FLOOR_MSPS = 0.7


def _nee_quality_setup():
    import raytracingpbr_tpu as rt
    from raytracingpbr_tpu.ops import ibl as ibllib
    from raytracingpbr_tpu.ops.scene import ObjectSpec
    from raytracingpbr_tpu.ops.sdf import SHAPE

    img = np.full((64, 32, 3), 0.05, np.float32)
    img[40:44, 24:28] = 25.0
    env = ibllib.with_env_sampler(
        rt.hdr_environment(jnp.asarray(img), prebake=False))
    scene = rt.make_scene([
        ObjectSpec(SHAPE.SPHERE, position=(0, -101, 0), scale=(100,) * 3,
                   albedo=(0.7, 0.7, 0.7), roughness=1.0),
        ObjectSpec(SHAPE.SPHERE, position=(-1.1, 0, 0), scale=(1.0,) * 3,
                   albedo=(0.6, 0.4, 0.3), roughness=1.0),
        ObjectSpec(SHAPE.SPHERE, position=(1.1, 0, 0), scale=(1.0,) * 3,
                   albedo=(0.9, 0.9, 0.9), roughness=0.5, metallic=1.0),
    ])
    cam = rt.make_camera(lookfrom=(0, 1.2, 5.0), lookat=(0, 0, 0),
                         vfov=40.0, aspect=1.0, aperture=0.0, focus=1.0)
    cfg = rt.RenderConfig(
        resolution=(160, 160), max_raymarch=64, max_raytrace=64,
        omega=1.0, omega_policy=rt.OmegaPolicy.CONSTANT,
        hit_criterion=rt.HitCriterion.ABSOLUTE, hit_precision=1e-4,
        march_t0=0.005, max_dis=300.0, samples_per_frame=4)
    return scene, env, cam, cfg


def _mean_image(state):
    a = np.asarray(state.accum)
    return a[:, :3] / np.maximum(a[:, 3:4], 1.0)


def test_nee_equal_time_quality_floor():
    """Same wall-time, env_sampling off vs on, PSNR against a converged
    NEE truth: the variance-reduction advantage must stay >= 8 dB
    (tools/bench_nee.py methodology; r4 measured ~16 dB)."""
    from raytracingpbr_tpu.utils.metrics import psnr

    scene, env, cam, cfg = _nee_quality_setup()
    budget_s = 2.0

    def run(c, seconds):
        state = make_frame_state(c.num_pixels)
        frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st,
                                                      c))
        px, state = frame(state)
        jax.block_until_ready(px)
        state = make_frame_state(c.num_pixels)
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            px, state = frame(state)
            jax.block_until_ready(px)
        return state

    truth = _mean_image(run(cfg.replace(env_sampling=True), 8 * budget_s))
    plain = _mean_image(run(cfg, budget_s))
    nee = _mean_image(run(cfg.replace(env_sampling=True), budget_s))
    db_plain = psnr(np.clip(plain, 0, 4), np.clip(truth, 0, 4), peak=4.0)
    db_nee = psnr(np.clip(nee, 0, 4), np.clip(truth, 0, 4), peak=4.0)
    assert db_nee - db_plain >= NEE_EQUAL_TIME_DB_FLOOR, (
        f"equal-time NEE advantage {db_nee - db_plain:.1f} dB "
        f"(nee {db_nee:.1f} vs plain {db_plain:.1f}) below floor")


def test_parity_block_corr_floor():
    """Structural agreement with the reference's own published artifact
    (/root/reference/others/cornell_box_taichi.png) must not regress:
    block-corr >= 0.93 at an in-gate sample budget (PARITY.md r4 recorded
    0.962 at 768 spp)."""
    import os

    import raytracingpbr_tpu as rt
    from raytracingpbr_tpu.io import image as imageio
    from raytracingpbr_tpu.models import cornell as cmod
    from raytracingpbr_tpu.ops import post as postlib2
    from raytracingpbr_tpu.utils.metrics import block_corr

    ref_png = "/root/reference/others/cornell_box_taichi.png"
    if not os.path.exists(ref_png):
        pytest.skip("reference golden not present")
    gold = imageio.read_png(ref_png)[..., :3].astype(np.float32) / 255.0

    # tools/parity_cornell.py recipe (megakernel estimator — the golden
    # was rendered by the example megakernel; see its NOTE), at an in-gate
    # 96-spp budget instead of 768.
    cfg = cmod.full_config().replace(resolution=gold.shape[:2][::-1])
    scene = cmod.full_scene()
    cam = cmod.full_camera()
    env = cmod.sky()
    f = jax.jit(lambda s: rt.render_image(scene, env, cam, cfg, spp=8,
                                          sample_offset=s,
                                          tonemapped=False))
    acc = None
    for k in range(12):
        img = f(jnp.uint32(k * 8))
        acc = img if acc is None else acc + img
    img = np.asarray(postlib2.tonemap(acc / 12, cfg, 0.6))
    bc = block_corr(img, gold)
    assert bc >= PARITY_BLOCK_CORR_FLOOR, (
        f"block-corr vs reference golden {bc:.4f} below "
        f"{PARITY_BLOCK_CORR_FLOOR}")


def test_replay_nee_throughput_floor():
    """Backward replay with NEE/MIS (the inverse-rendering config) must
    keep >= 0.7 Msamples/s on the bench workload (r4: 0.433; r5 measures
    1.12 after the gather-free env-table fetches)."""
    import bench as benchmod

    msps = benchmod.bench_fwd_bwd(max_raytrace=128,
                                  differentiable="replay",
                                  env_sampling=True,
                                  label="tpu-gate replay+NEE")
    assert msps >= REPLAY_NEE_FLOOR_MSPS, (
        f"replay+NEE {msps:.3f} Msps below {REPLAY_NEE_FLOOR_MSPS}")


def test_wavefront_throughput_floor(cornell_setup):
    """Cornell full-PBR wavefront >= 5 Msamples/s AT THE DEFAULT CONFIG.

    This is the gate the r3 regression needed: it measures whatever the
    current defaults are (no march_compaction override), so flipping any
    perf-affecting default into a slow path fails the suite on hardware."""
    scene, cfg, cam, env, _ = cornell_setup
    c = cfg.replace(samples_per_frame=4, max_raytrace=512,
                    quality_per_sample=0.8)
    state = make_frame_state(c.num_pixels)
    frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, c))
    px, state = frame(state)
    jax.block_until_ready(px)
    for _ in range(3):
        px, state = frame(state)
    jax.block_until_ready(px)
    c0 = float(state.accum[:, 3].sum())
    t0 = time.perf_counter()
    for _ in range(10):
        px, state = frame(state)
    jax.block_until_ready(px)
    dt = (time.perf_counter() - t0) / 10
    c1 = float(state.accum[:, 3].sum())
    msps = (c1 - c0) / 10 / dt / 1e6
    assert msps >= WAVEFRONT_FLOOR_MSPS, (
        f"wavefront {msps:.2f} Msamples/s is below the {WAVEFRONT_FLOOR_MSPS}"
        f" floor — a perf-affecting default has regressed (see "
        f"tools/probe_phased.py for the A/B methodology)")
