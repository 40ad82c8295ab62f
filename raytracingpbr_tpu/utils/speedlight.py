"""Speed-of-light (utilization) accounting for the march kernel.

BASELINE.md's north star is "fwd+bwd megasamples/s hit speed-of-light per
chip"; the reference publishes no numbers (``/root/reference/README.md:7-30``)
so the bound must come from the hardware itself. This module provides the two
halves of a defensible %-of-bound metric for the march — the measured hot
loop (SCALING.md step anatomy: march 5.9 ms vs 0.5 ms everything else):

1. ``measure_vpu_peak()`` — an empirical f32 VPU FMA roof, measured with a
   Pallas kernel on the same chip the bench runs on (8 independent FMA
   chains per (8, 128) tile, long enough to amortize launch overhead).
   Measuring beats quoting a datasheet: it inherits the clocks, the Mosaic
   scheduler, and the same pallas_call dispatch path the march pays.

2. ``march_flops_per_iter(scene)`` — the *minimal algorithmic* flop count of
   one march iteration per lane for a given scene, from the per-object shape
   and rotation classification. Convention: every elementwise op (add, mul,
   sub, min, max, abs, select, compare, sqrt, sin) counts 1, FMA counts 2.
   This undercounts the hardware's true cost of sqrt/sin (multi-pass on the
   VPU), so the reported utilization is a LOWER bound — honest in the
   direction that matters.

``march_utilization()`` combines them with the per-tile trip counts the
Pallas kernel reports (``march_kernel.march_pallas`` 4th output): executed
lane-iterations x flops/iter / elapsed / peak.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops.scene import Scene
from ..ops.sdf import SHAPE

# --- static flop model -------------------------------------------------------

# Per-shape distance-function flops (local point -> |distance| is counted in
# the loop overhead), minimal-algorithmic convention (see module docstring).
_SHAPE_FLOPS = {
    int(SHAPE.NONE): 0,
    int(SHAPE.SPHERE): 7,     # 3 mul + 2 add + sqrt + sub
    int(SHAPE.BOX): 20,       # 3(abs+sub) + 3 max + (3 mul+2 add+sqrt) + 2 max
                              # + min + add + sub(round)
    int(SHAPE.CYLINDER): 15,  # xz norm(4) + 2(abs+sub) + 2 max + max + min
                              # + norm(4)... rounded
    int(SHAPE.CONE): 8,       # xz norm(4) + 2 fma-ish + 2 max-ish
    int(SHAPE.PLANE): 1,      # py - sy
}

# Neural bunny sin-MLP (pallas/march_kernel._bunny_tile): input layer
# 16x(3 FMA + sin) = 48 FMA + 16 sin; two hidden layers 16x16 FMA + 16 sin
# + 16 add (skip) each (the second also 16 mul); output 16 FMA + add;
# support test r(7) + select(1). FMA = 2 flops, sin = 1 (lower bound).
_BUNNY_FLOPS = (48 * 2 + 16) + 2 * (256 * 2 + 16 + 16) + 16 + (16 * 2 + 1) + 8

# Per-object transform: 3 sub (translate) + local_offset 3 add, plus either
# a signed permutation (3 select/neg) or a 9-FMA rotation row-matmul.
_XFORM_PERM = 3 + 3 + 3
_XFORM_MAT = 3 + 3 + 9 * 2

# Per-object combine: abs + compare + 2 selects (index, best).
_COMBINE = 4

# Loop bookkeeping per iteration per lane (pallas/march_kernel._march_kernel
# body): position update 3 FMA (6), rollback test + policy selects (~6),
# step/hit-criterion (~6), t/hit/done/w/s/d/index updates (~12), escape test
# (~4; +8 with the bound check).
_LOOP_OVERHEAD = 34
_ESCAPE_BOUND_EXTRA = 8


def march_flops_per_iter(scene: Scene, cfg: Optional[RenderConfig] = None
                         ) -> int:
    """Minimal-algorithmic flops of ONE march iteration for ONE lane."""
    total = _LOOP_OVERHEAD
    if cfg is not None and cfg.escape_bound:
        total += _ESCAPE_BOUND_EXTRA
    for i, t in enumerate(scene.shape_types):
        perm = scene.rot_perm[i] if scene.rot_perm else None
        total += _XFORM_PERM if perm is not None else _XFORM_MAT
        total += _BUNNY_FLOPS if t == SHAPE.BUNNY else _SHAPE_FLOPS[int(t)]
        total += _COMBINE
    return total


# --- empirical VPU roof ------------------------------------------------------


def _fma_chains_kernel(x_ref, o_ref, *, iters: int, chains: int,
                       unroll: int):
    accs = [x_ref[:] * (1.0 + 0.001 * k) for k in range(chains)]
    a = x_ref[:] * 0.25 + 0.5   # values near 0.5..1: no overflow over iters

    def body(_, accs):
        # `chains` independent FMA chains x `unroll` sequential FMAs each —
        # the ILP that fills the VPU pipeline (dependence is per-chain only).
        out = list(accs)
        for _u in range(unroll):
            out = [acc * a + 0.125 for acc in out]
        return tuple(out)

    accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
    out = accs[0]
    for z in accs[1:]:
        out = out + z
    o_ref[:] = out


def _measure_fma_config(tiles, iters, chains, unroll) -> float:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_fma_chains_kernel, iters=iters,
                               chains=chains, unroll=unroll)
    x = jnp.full((tiles, 8, 128), 0.7, jnp.float32)
    spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(tiles,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x))
    jax.block_until_ready(f(x))  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    flops = tiles * 8 * 128 * iters * chains * unroll * 2
    return flops / dt


@functools.lru_cache(maxsize=1)
def measure_vpu_peak() -> float:
    """Measured f32 FMA roof in flops/s on the current default backend.

    Max over a small ILP sweep (register pressure caps the useful chain
    count; v5e measured best at 32 chains x 4-deep unroll = 1.4 Tflop/s).
    Returns flops/s; cached (one measurement per process).
    """
    configs = ((256, 1024, 32, 1), (256, 256, 32, 4), (256, 256, 16, 4))
    return max(_measure_fma_config(*c) for c in configs)


def phased_executed(fin, phases, chunk: int) -> int:
    """Executed lane-iterations of the compacted multi-phase schedule.

    Replays ``march_phased``'s stable-partition bookkeeping on the measured
    per-lane needs: each phase packs still-unconverged lanes to the front
    (original order preserved), tiles them, and every tile executes
    ``min(ceil(tile-max remaining / chunk) * chunk, budget)`` iterations
    over TILE lanes.
    """
    import numpy as np

    from ..pallas.march_kernel import TILE

    need = np.asarray(fin, np.int64)
    pad = (-need.shape[0]) % TILE
    if pad:
        need = np.concatenate([need, np.zeros(pad, np.int64)])
    done = need <= 0  # gated lanes never enter
    start = np.zeros_like(need)
    executed = 0
    for b in phases:
        # stable partition: unconverged lanes packed to the front in their
        # original order (exactly march_phased's counting partition)
        rem = np.where(~done, need - start, 0)
        rem = rem[rem > 0]
        if rem.size == 0:
            break
        rem = np.concatenate([rem, np.zeros((-rem.size) % TILE, np.int64)])
        tile_max = rem.reshape(-1, TILE).max(axis=1)
        trips = np.minimum(-(-np.minimum(tile_max, b) // chunk) * chunk, b)
        executed += int(trips.sum()) * TILE
        start = np.minimum(start + b, need)
        done = done | (start >= need)
    return executed


def march_utilization(scene: Scene, origin, direction, cfg: RenderConfig,
                      active=None, reps: int = 10) -> dict:
    """Run the production Pallas march (compacted multi-phase when
    ``cfg.march_compaction``) and report its %-of-VPU-roof utilization.

    Two utilization numbers come out of the per-lane convergence counts:

    * ``utilization_pct`` — executed work vs the roof. Executed iterations
      follow the actual schedule: per tile ``ceil(max lane need / chunk) *
      chunk`` for the single-shot kernel, the per-phase repacked equivalent
      (:func:`phased_executed`) for the compacted march.
    * ``useful_pct`` — algorithmically NEEDED work vs the roof (each lane
      counted only until its own convergence). The gap between the two is
      the divergence + chunk-rounding tax; it bounds what further ray
      reordering ("Shader Execution Reordering", the reference's own ToDo at
      src/pathtracer.py:98) could recover.
    """
    import numpy as np

    from ..pallas.march_kernel import (TILE_COLS, march_pallas,
                                       march_phased, resolve_chunk,
                                       resolve_phases, resolve_tile_rows)

    tile = resolve_tile_rows(cfg) * TILE_COLS

    phased = cfg.march_compaction and len(resolve_phases(cfg)) > 1
    impl = march_phased if phased else march_pallas
    f = jax.jit(lambda o, d: impl(scene, o, d, cfg, active=active))
    t, idx, hit, lane_iters = f(origin, direction)
    jax.block_until_ready(t)
    t0 = time.perf_counter()
    for _ in range(reps):
        t, idx, hit, lane_iters = f(origin, direction)
    jax.block_until_ready(t)
    dt = (time.perf_counter() - t0) / reps

    fin = np.asarray(jax.device_get(lane_iters), np.int64)
    pad = (-fin.shape[0]) % tile
    if pad:
        fin = np.concatenate([fin, np.zeros(pad, np.int64)])
    chunk = resolve_chunk(cfg)
    if phased:
        executed = phased_executed(fin, resolve_phases(cfg), chunk)
    else:
        per_tile_max = fin.reshape(-1, tile).max(axis=1)
        trips = np.minimum(-(-per_tile_max // chunk) * chunk,
                           cfg.max_raymarch)
        executed = int(trips.sum()) * tile
    needed = int(fin.sum())

    fpi = march_flops_per_iter(scene, cfg)
    peak = measure_vpu_peak()
    achieved = executed * fpi / dt
    return {
        "march_s": dt,
        "lane_iters_executed": executed,
        "lane_iters_needed": needed,
        "flops_per_iter": fpi,
        "achieved_gflops": achieved / 1e9,
        "roof_gflops": peak / 1e9,
        "utilization_pct": 100.0 * achieved / peak,
        "useful_pct": 100.0 * needed * fpi / dt / peak,
        "divergence_tax_pct": 100.0 * (1.0 - needed / max(executed, 1)),
    }
