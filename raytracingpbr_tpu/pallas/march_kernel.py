"""Pallas TPU kernel: fused enhanced-sphere-trace march.

The XLA march (``ops/march.py``) advances the whole flat ray batch in
lock-step, so one straggler ray keeps every lane marching — batch-global
divergence. This kernel restores divergence *locality* (SURVEY.md §7.4.1,
§7.2.10): the grid splits rays into (8, 128) register-shaped tiles, each grid
program runs its own march loop and exits as soon as *its* tile converges.
With hit distributions that vary across the screen this is the difference
between paying max-iters globally and paying it per ~1k-ray tile.

Scene representation: the same static-type-bucket idea as
``ops/scene.all_distances`` — the object loop is unrolled in Python at trace
time over a packed (n_obj, 16) parameter block resident in VMEM:
``[position(3), scale(3), rotation matrix rows(9), pad]``. Shape types come
from the static scene metadata. All math is elementwise on (8, 128) arrays —
native VPU shape; no gathers, no dynamic indexing.

The march semantics mirror ``ops/march.py`` exactly (same omega policies and
hit criteria, reference ``src/scene.py:59-84``); parity is asserted in
tests/test_pallas.py on the interpreter and in the TPU smoke bench.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HitCriterion, OmegaPolicy, RenderConfig
from ..ops.scene import Scene
from ..ops.sdf import SHAPE

# ray tile: 8 sublanes x 128 lanes (f32 native tile)
TILE_ROWS = 8
TILE_COLS = 128
TILE = TILE_ROWS * TILE_COLS


def pack_scene(scene: Scene, escape_bound: bool = False) -> jax.Array:
    """Pack per-object transform params into an (n, 32) f32 block:
    [pos(3), scale(3), mat row-major (9), local_offset(3),
    bound^2 or 0 (1), pad(13)]. Column 18 carries the squared scene
    bounding radius when the escape-bound early exit is on (0 = disabled)."""
    n = scene.num_objects
    mat = scene.matrix.reshape(n, 9)
    bound = None
    if escape_bound:
        from ..ops.scene import bounding_radius
        bound = bounding_radius(scene)
    b2 = (jnp.zeros((n, 1), scene.position.dtype) if bound is None
          else jnp.full((n, 1), 1.0, scene.position.dtype) * (bound * bound))
    pad = jnp.zeros((n, 13), scene.position.dtype)
    return jnp.concatenate(
        [scene.position, scene.scale, mat, scene.local_offset, b2, pad],
        axis=-1)


def pack_bunny(scene: Scene) -> jax.Array:
    """Pack the bunny MLP weights into a (40, 16) f32 block for static
    in-kernel indexing: rows 0-2 w_in, 3 b_in, 4-19 w_h1, 20 b_h1,
    21-36 w_h2, 37 b_h2, 38 w_out, 39 [bias_out, 0...]."""
    b = scene.bunny
    last = jnp.zeros((1, 16), b.w_in.dtype).at[0, 0].set(b.bias_out)
    return jnp.concatenate([
        b.w_in, b.b_in[None], b.w_h1, b.b_h1[None], b.w_h2, b.b_h2[None],
        b.w_out[None], last], axis=0)


def pack_bunny_mxu(scene: Scene) -> jax.Array:
    """Pack the bunny MLP as MXU-ready block-Kronecker matrices.

    The kernel's activations live as a (128, 128) stack of 16 feature
    tiles: row ``8*k + r`` holds feature ``k``'s (8, 128) tile sublane
    ``r``. In that layout the 16-wide contraction ``out[k] = sum_j W[j,k] *
    f[j]`` IS a (128,128) @ (128,128) matmul with the constant matrix
    ``M = kron(W.T, eye(8))`` (``M[8k+r, 8j+r'] = W[j,k] * delta(r,r')``) —
    no transposes or relayouts anywhere; the MXU eats the contraction and
    the VPU keeps only the sins/residuals (VERDICT r4 item 3).

    Layout of the returned (784, 128) f32 block (features live in ROW
    blocks: activation row 8k+r = feature k, tile sublane r):
      rows   0-127  M_in  = kron(w_in.T (16,3), eye(8)), zero-padded K cols
      rows 128-255  M_h1  = kron(w_h1.T, eye(8))
      rows 256-383  M_h2  = kron(w_h2.T, eye(8))
      rows 384-511  B_in  broadcast: row 8k+r = b_in[k] (all 128 cols)
      rows 512-639  B_h1  likewise
      rows 640-767  B_h2  likewise
      rows 768-775  V_out = kron(w_out (1,16), eye(8)) — (8, 128)
      row  776      col 0 = bias_out
      rows 777-783  zero padding

    Built with jnp ops: the scene may be a traced constant inside jit
    (march_pallas packs at trace time; XLA constant-folds it).
    """
    b = scene.bunny
    f32 = jnp.float32
    w_in = jnp.asarray(b.w_in, f32)    # (3, 16)
    w_h1 = jnp.asarray(b.w_h1, f32)    # (16, 16)
    w_h2 = jnp.asarray(b.w_h2, f32)    # (16, 16)
    w_out = jnp.asarray(b.w_out, f32)  # (16,)
    eye8 = jnp.eye(8, dtype=f32)

    def kron_t(w):  # (j_in, 16) -> (128, 8*j_in) -> pad K cols to 128
        m = jnp.kron(w.T, eye8)  # (128, 8*j_in)
        return jnp.pad(m, ((0, 0), (0, 128 - m.shape[1])))

    def bfull(v):  # per-feature bias -> (128, 128) row-block broadcast
        return jnp.tile(jnp.repeat(jnp.asarray(v, f32), 8)[:, None],
                        (1, 128))

    v_out = jnp.kron(w_out[None, :], eye8)  # (8, 128)
    last = jnp.zeros((1, 128), f32).at[0, 0].set(b.bias_out)
    return jnp.concatenate([
        kron_t(w_in), kron_t(w_h1), kron_t(w_h2),
        bfull(b.b_in), bfull(b.b_h1), bfull(b.b_h2),
        v_out, last,
        jnp.zeros((7, 128), f32)], axis=0)  # 784 rows


def _bunny_tile_mxu(mref, px, py, pz):
    """MXU bunny eval on an (8, 128) tile (see pack_bunny_mxu): three
    (128,128) matmuls + per-tile sins. Math identical to _bunny_tile up to
    f32 summation order inside the MXU contraction."""
    f32 = jnp.float32
    shape_in = px.shape  # (1, rows, 128) inside the kernel's block
    rows = shape_in[-2]
    if rows != 8:
        raise ValueError("bunny_mxu requires march_tile_rows=8 (the kron "
                         "packing assumes 8-sublane feature blocks)")
    px, py, pz = (v.reshape(rows, TILE_COLS) for v in (px, py, pz))
    pad = jnp.zeros((128 - 3 * rows, TILE_COLS), f32)
    p = jnp.concatenate([px, py, pz, pad], axis=0)        # (128, 128)
    m_in = mref[0:128, :]
    m_h1 = mref[128:256, :]
    m_h2 = mref[256:384, :]
    b_in = mref[384:512, :]
    b_h1 = mref[512:640, :]
    b_h2 = mref[640:768, :]
    v_out = mref[768:776, :]
    bias_out = mref[776, 0]

    dot = lambda a, x: jax.lax.dot_general(
        a, x, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    f0 = jnp.sin(dot(m_in, p) + b_in)
    f1 = jnp.sin(dot(m_h1, f0) + b_h1) + f0
    f2 = jnp.sin(dot(m_h2, f1) + b_h2) * (1.0 / 1.4) + f1
    sd = dot(v_out, f2) + bias_out                        # (8, 128)
    r = jnp.sqrt(px * px + py * py + pz * pz)
    return jnp.where(r > 1.0, r - 0.8, sd).reshape(shape_in)


def _bunny_tile(wref, px, py, pz):
    """Sin-MLP bunny SDF on an (8, 128) tile — the two 16-wide hidden
    layers unrolled as VPU FMA chains (a 16x16 contraction is far below
    MXU-efficient size; the unroll keeps everything in vector registers).
    Math identical to ops/sdf.bunny_mlp_eval (bunny_sdf_glass.py:150-203).
    """
    f0 = [jnp.sin(px * wref[0, k] + py * wref[1, k] + pz * wref[2, k]
                  + wref[3, k]) for k in range(16)]
    f1 = []
    for k in range(16):
        acc = f0[0] * wref[4, k]
        for j in range(1, 16):
            acc = acc + f0[j] * wref[4 + j, k]
        f1.append(jnp.sin(acc + wref[20, k]) + f0[k])
    f2 = []
    for k in range(16):
        acc = f1[0] * wref[21, k]
        for j in range(1, 16):
            acc = acc + f1[j] * wref[21 + j, k]
        f2.append(jnp.sin(acc + wref[37, k]) * (1.0 / 1.4) + f1[k])
    sd = f2[0] * wref[38, 0]
    for k in range(1, 16):
        sd = sd + f2[k] * wref[38, k]
    sd = sd + wref[39, 0]
    r = jnp.sqrt(px * px + py * py + pz * pz)
    return jnp.where(r > 1.0, r - 0.8, sd)


def _sd_tile(type_id: int, px, py, pz, sx, sy, sz, box_round: float):
    """Distance of one object type for a tile of local points (8, 128).

    Same formulas as ops/sdf.py (iquilezles), expressed on unpacked
    coordinates (scalars sx/sy/sz are this object's scale components).
    """
    t = SHAPE(type_id)
    if t == SHAPE.SPHERE:
        return jnp.sqrt(px * px + py * py + pz * pz) - sx
    if t == SHAPE.BOX:
        qx = jnp.abs(px) - sx
        qy = jnp.abs(py) - sy
        qz = jnp.abs(pz) - sz
        ox = jnp.maximum(qx, 0.0)
        oy = jnp.maximum(qy, 0.0)
        oz = jnp.maximum(qz, 0.0)
        outside = jnp.sqrt(ox * ox + oy * oy + oz * oz)
        inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
        return outside + inside - box_round
    if t == SHAPE.CYLINDER:
        dx = jnp.abs(jnp.sqrt(px * px + pz * pz)) - sx
        dy = jnp.abs(py) - sy
        mx = jnp.maximum(dx, 0.0)
        my = jnp.maximum(dy, 0.0)
        return (jnp.minimum(jnp.maximum(dx, dy), 0.0)
                + jnp.sqrt(mx * mx + my * my))
    if t == SHAPE.CONE:
        q = jnp.sqrt(px * px + pz * pz)
        return jnp.maximum(sx * q + sz * py, -sy - py)
    if t == SHAPE.PLANE:
        return py - sy
    # SHAPE.NONE
    return jnp.full_like(px, 1e3)


def _nearest_tile(scene_types, obj_params, x, y, z, box_round,
                  bunny_ref=None, rot_perm=None, bunny_mxu=False):
    """Unrolled min over |sd_i| for a tile of world points. Returns
    (min_dis, index) as (8, 128) arrays.

    ``obj_params``: list of per-object scalar tuples pre-loaded OUTSIDE the
    march loop (one VMEM scalar read per parameter per kernel, not per
    iteration). ``rot_perm``: static per-object signed-permutation
    classification (Scene.rot_perm) — identity and 90-degree rotations
    (most objects in every reference scene) skip the 9-mul row matmuls."""
    best = jnp.full_like(x, 1e3)
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for i, t in enumerate(scene_types):
        pr = obj_params[i]
        # object space: translate, rotate, then animation offset
        # (src/sdf.py:64-68 + ops/scene._local)
        tx = x - pr[0]
        ty = y - pr[1]
        tz = z - pr[2]
        perm = rot_perm[i] if rot_perm is not None else None
        if perm is not None:
            tv = (tx, ty, tz)
            (p0, p1, p2), (s0, s1, s2) = perm
            px = (tv[p0] if s0 > 0 else -tv[p0]) + pr[15]
            py = (tv[p1] if s1 > 0 else -tv[p1]) + pr[16]
            pz = (tv[p2] if s2 > 0 else -tv[p2]) + pr[17]
        else:
            px = pr[6] * tx + pr[7] * ty + pr[8] * tz + pr[15]
            py = pr[9] * tx + pr[10] * ty + pr[11] * tz + pr[16]
            pz = pr[12] * tx + pr[13] * ty + pr[14] * tz + pr[17]
        if t == SHAPE.BUNNY:
            # Tile-level support guard: the sin-MLP is only valid (and only
            # needed) inside the unit sphere; outside, sd_bunny falls back to
            # the analytic ``r - 0.8`` (bunny_sdf_glass.py:151-155). The MLP
            # is ~650 VPU FMAs + 48 sins per eval — by far the most expensive
            # SDF — and a bunny occupies a small screen fraction, so most
            # (8,128) tiles never have a lane inside the support during most
            # march iterations. One cross-lane min + lax.cond skips the MLP
            # for the whole tile in that common case (lanes are pixel-
            # coherent, so the guard hits).
            r2 = px * px + py * py + pz * pz
            tile_fn = _bunny_tile_mxu if bunny_mxu else _bunny_tile
            d = jax.lax.cond(
                jnp.min(r2) <= 1.0,  # <= : at r == 1 _bunny_tile uses the MLP
                lambda: jnp.abs(tile_fn(bunny_ref, px, py, pz)),
                lambda: jnp.sqrt(r2) - 0.8)  # r > 1 everywhere -> positive
        else:
            d = jnp.abs(
                _sd_tile(t, px, py, pz, pr[3], pr[4], pr[5], box_round))
        take = d < best
        idx = jnp.where(take, i, idx)
        best = jnp.where(take, d, best)
    return best, idx


def resolve_chunk(cfg: RenderConfig) -> int:
    """March-loop unroll: iterations per cross-lane convergence check.

    Amortizes the cross-lane any-active reduction and loop branch over
    several masked iterations; post-convergence work inside a chunk is
    masked out, so semantics are chunk-invariant. 32 measured best on v5e
    for the cornell wavefront (mixed-state march 7.7ms @8 -> 6.8ms @32);
    64 blows up Mosaic compile time. Interpreter/CPU runs (tests) keep a
    small unroll — there the masked extra iterations are real work.
    """
    if cfg.march_chunk is not None:
        if cfg.max_raymarch % cfg.march_chunk != 0:
            raise ValueError(
                f"march_chunk={cfg.march_chunk} must divide "
                f"max_raymarch={cfg.max_raymarch} (chunked unrolling must "
                "not overshoot the iteration budget)")
        target = cfg.march_chunk
    else:
        target = 32 if jax.default_backend() not in ("cpu", "gpu") else 4
    return next((c for c in (target, 16, 8, 4) if c <= target
                 and cfg.max_raymarch % c == 0), 1)


def _march_kernel(params_ref, *refs, scene_types: Tuple[int, ...], cfg,
                  box_round: float, has_bunny: bool, has_active: bool,
                  rot_perm: Tuple = None, has_bound: bool = False,
                  has_init: bool = False, bunny_mxu: bool = False):
    refs = list(refs)
    bunny_ref = refs.pop(0) if has_bunny else None
    act_ref = refs.pop(0) if has_active else None
    init_refs = [refs.pop(0) for _ in range(4)] if has_init else None
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     t_ref, idx_ref, hit_ref, iters_ref,
     wout_ref, sout_ref, dout_ref, done_ref) = refs
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # Hoist every per-object scalar out of the march loop: one VMEM scalar
    # read per parameter per kernel invocation instead of per iteration.
    obj_params = [tuple(params_ref[i, k] for k in range(18))
                  for i in range(len(scene_types))]

    bound2 = params_ref[0, 18] if has_bound else None
    pixel_radius = cfg.pixel_radius
    w0 = cfg.omega
    rollback_allowed = cfg.omega_policy != OmegaPolicy.CONSTANT
    chunk = resolve_chunk(cfg)

    # Masks live in the loop carry as int32 (0/1) — Mosaic does not lower
    # i1 vectors in while-loop carries ("unsupported target bitwidth").
    def cond(st):
        i, t, w, s, d, idx, hit, done, fin = st
        return (i < cfg.max_raymarch) & (jnp.min(done) < 1)

    def body(st):
        i, t, w, s, d, idx, hit, done, fin = st
        x = ox + t * dx
        y = oy + t * dy
        z = oz + t * dz
        dist, index = _nearest_tile(scene_types, obj_params, x, y, z,
                                    box_round, bunny_ref, rot_perm,
                                    bunny_mxu=bunny_mxu)
        ld = d

        if not rollback_allowed:
            rollback = jnp.zeros_like(t) > 1.0
            w_next = w
        else:
            # relative epsilon: exact bound-touching (ld + dist == s) must
            # roll back or the ray tunnels — see ops/march.py body()
            rollback = ld + dist < s * (1.0 + 1e-6)
            if cfg.omega_policy == OmegaPolicy.ROLLBACK_TO_ONE:
                rollback = rollback & (w > 1.0)
                w_next = jnp.where(rollback, 1.0, w)
            else:
                w_next = jnp.where(rollback, 0.5 + 0.5 * w, w)

        s_rb = s * (1.0 - w)
        s_fwd = w_next * dist

        if cfg.hit_criterion == HitCriterion.CONE:
            hit_now = dist < (t + s_fwd) * pixel_radius
        elif cfg.hit_criterion == HitCriterion.RELATIVE:
            hit_now = dist / jnp.maximum(t, 1e-12) < pixel_radius
        else:
            hit_now = dist < cfg.hit_precision

        active = done < 1
        upd = active & (~rollback)
        step = jnp.where(rollback, s_rb, s_fwd)
        t_new = jnp.where(active, t + step, t)
        hit_new = jnp.where(upd, hit_now.astype(jnp.int32), hit)
        escaped = t_new >= cfg.max_dis
        if bound2 is not None:
            # outside the scene bounding sphere and receding -> no hit ahead
            escaped = escaped | ((x * x + y * y + z * z > bound2)
                                 & (x * dx + y * dy + z * dz > 0.0))
        done_new = jnp.maximum(
            done, (upd & (hit_now | escaped)).astype(jnp.int32))
        # record each lane's convergence iteration (1-based count of body
        # evaluations it actually needed) — the load-imbalance /
        # utilization-accounting signal (see march_pallas docstring)
        fin = jnp.where((done < 1) & (done_new > 0), i + 1, fin)
        return (i + 1,
                t_new,
                jnp.where(active, w_next, w),
                jnp.where(active, step, s),
                jnp.where(active, dist, d),
                jnp.where(active, index, idx),
                hit_new,
                done_new,
                fin)

    def chunk_body(st):
        for _ in range(chunk):
            st = body(st)
        return st

    shape = ox.shape
    f = lambda v: jnp.full(shape, v, ox.dtype)
    # inactive lanes start done: an all-inactive tile exits before its first
    # nearest() evaluation (adaptive-sampling gate, dead megakernel lanes)
    done0 = ((1 - act_ref[:]) if has_active
             else jnp.zeros(shape, jnp.int32))
    fin0 = done0 * 0 + (1 - done0) * jnp.int32(cfg.max_raymarch)
    if has_init:
        # phase resumption (march_phased): carry the loop state of a prior
        # budget-limited run — per lane, the iteration sequence is identical
        # to one uninterrupted march
        t0v, w0v, s0v, d0v = (r[:] for r in init_refs)
    else:
        t0v, w0v, s0v, d0v = f(cfg.march_t0), f(w0), f(0.0), f(1e3)
    st = jax.lax.while_loop(cond, chunk_body, (
        jnp.zeros((), jnp.int32),
        t0v,
        w0v,
        s0v,
        d0v,
        jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, jnp.int32),
        done0,
        fin0,
    ))
    i_final, t, w, s, d, idx, hit, done, fin = st
    t_ref[:] = t
    idx_ref[:] = idx
    hit_ref[:] = hit
    iters_ref[:] = fin
    wout_ref[:] = w
    sout_ref[:] = s
    dout_ref[:] = d
    done_ref[:] = done


def resolve_tile_rows(cfg: RenderConfig) -> int:
    """Tile height (sublanes) for the march kernel — see the
    ``march_tile_rows`` config note. Auto: tall (32) tiles when the
    kernel's own trip budget is one-or-two chunks (the split-march step:
    every active tile pays the full budget anyway, so height only
    amortizes per-tile fixed cost — measured +11%); standard (8, 128)
    tiles for long single-shot marches where height coarsens the per-tile
    early exit. bunny_mxu's kron packing assumes 8 sublanes."""
    if cfg.march_tile_rows is not None:
        return cfg.march_tile_rows
    if cfg.bunny_mxu:
        return 8
    return 32 if cfg.max_raymarch <= 64 else 8


def _pad_to_tile(x: jax.Array, tile: int = TILE) -> Tuple[jax.Array, int]:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


@functools.partial(jax.jit, static_argnames=("scene_types", "box_round",
                                             "cfg", "rot_perm", "has_bound",
                                             "bunny_mxu"))
def _march_pallas_impl(params, bunny, origin, direction, active, scene_types,
                       box_round, cfg: RenderConfig, rot_perm=None,
                       has_bound=False, init=None, bunny_mxu=False):
    rows = resolve_tile_rows(cfg)
    tile = rows * TILE_COLS
    o_pad, n = _pad_to_tile(origin, tile)
    d_pad, _ = _pad_to_tile(direction, tile)
    num = o_pad.shape[0]
    tiles = num // tile
    shape3 = (tiles, rows, TILE_COLS)

    def split(v):
        return [v[:, k].reshape(shape3) for k in range(3)]

    ox, oy, oz = split(o_pad)
    dx, dy, dz = split(d_pad)

    has_bunny = bunny is not None
    has_active = active is not None
    has_init = init is not None
    kernel = functools.partial(_march_kernel, scene_types=scene_types,
                               cfg=cfg, box_round=box_round,
                               has_bunny=has_bunny, has_active=has_active,
                               rot_perm=rot_perm, has_bound=has_bound,
                               has_init=has_init, bunny_mxu=bunny_mxu)

    tile_spec = pl.BlockSpec((1, rows, TILE_COLS),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    extra = [bunny] if has_bunny else []
    act = []
    if has_active:
        # pad lanes are inactive (padding rays must not march)
        a_pad, _ = _pad_to_tile(active.astype(jnp.int32), tile)
        act = [a_pad.reshape(shape3)]
    init_tiles = []
    if has_init:
        for v in init:  # (t, w, s, d) resumed loop state, (n,) f32 each
            v_pad, _ = _pad_to_tile(v, tile)
            init_tiles.append(v_pad.reshape(shape3))
    f32 = jnp.float32
    i32 = jnp.int32
    outs = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=([full_spec] * (1 + len(extra))
                  + [tile_spec] * (len(act) + len(init_tiles) + 6)),
        out_specs=[tile_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct(shape3, dt)
                   for dt in (f32, i32, i32, i32, f32, f32, f32, i32)],
    )(params, *extra, *act, *init_tiles, ox, oy, oz, dx, dy, dz)

    t, idx, hit, iters, w, s, d, done = (v.reshape(num)[:n] for v in outs)
    return t, idx, hit.astype(bool), iters, w, s, d, done


def march_pallas(scene: Scene, origin: jax.Array, direction: jax.Array,
                 cfg: RenderConfig, active=None):
    """Fused-march entry: returns ``(t, index, hit, lane_iters)`` — the
    first three match ``ops.march._march_loop``; ``lane_iters`` is the (N,)
    per-lane convergence iteration (how many body evaluations each lane
    actually needed; ``max_raymarch`` if it never converged, 0 if gated
    inactive). Each (8,128) tile executes ``ceil(max(lane_iters in tile) /
    chunk) * chunk`` iterations in lock-step — the utilization and
    load-imbalance accounting input (utils/speedlight.py).
    ``active``: optional (N,) bool lane gate (see ``ops.march.march``)."""
    has_bound = cfg.escape_bound and SHAPE.PLANE not in scene.shape_types
    params = pack_scene(scene, escape_bound=has_bound)
    mxu = cfg.bunny_mxu
    bunny = ((pack_bunny_mxu(scene) if mxu else pack_bunny(scene))
             if scene.bunny is not None else None)
    return _march_pallas_impl(params, bunny, origin, direction, active,
                              tuple(scene.shape_types),
                              float(scene.box_round), cfg,
                              rot_perm=tuple(scene.rot_perm),
                              has_bound=has_bound, bunny_mxu=mxu)[:4]


def resolve_phases(cfg: RenderConfig) -> Tuple[int, ...]:
    """Budget split for the phased (compacted) march.

    ``cfg.march_phases`` wins when set (must sum to ``max_raymarch``).
    Auto: a short budget runs in one phase; otherwise 32, 32, then doubling
    (512 -> 32+32+64+128+256; 2048 -> ... +512+1024), each capped by the
    remaining budget. Informed by tools/probe_divergence.py on cornell
    full-PBR: lane need p50=16, p99=69, max=512 — almost every lane
    converges in the first phase or two, and the sub-1% tail that poisons
    every (8,128) tile of a single-shot march gets repacked into a handful
    of tiles."""
    if cfg.march_phases is not None:
        ps = tuple(int(b) for b in cfg.march_phases)
        if sum(ps) != cfg.max_raymarch or any(b <= 0 for b in ps):
            raise ValueError(
                f"march_phases={cfg.march_phases} must be positive and sum "
                f"to max_raymarch={cfg.max_raymarch}")
        return ps
    m = cfg.max_raymarch
    # An explicit march_chunk must divide every phase budget (resolve_chunk
    # raises otherwise — e.g. march_chunk=64 with the old fixed 32-budget
    # phases broke inside the jitted march; ADVICE r3), so round budgets up
    # to chunk multiples.
    q = cfg.march_chunk if cfg.march_chunk else 1

    def up(b):
        return -(-b // q) * q

    if m <= max(64, 2 * q):
        return (m,)
    phases, nxt = [], up(32)
    while sum(phases) < m:
        b = min(nxt, m - sum(phases))
        phases.append(b)
        if len(phases) >= 2:
            nxt = up(nxt * 2)
    return tuple(phases)


def _partition_active(done: jax.Array) -> jax.Array:
    """Stable permutation putting not-done lanes first.

    ``done`` is (N,) int32 0/1; returns ``perm`` with ``perm[new] = old``
    (gather semantics). Cumsum-based counting partition — O(N), no sort."""
    n = done.shape[0]
    act = 1 - done
    n_act = jnp.sum(act)
    pos = jnp.where(act == 1,
                    jnp.cumsum(act) - 1,
                    n_act + jnp.cumsum(done) - 1)
    return jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))


def march_phased(scene: Scene, origin: jax.Array, direction: jax.Array,
                 cfg: RenderConfig, active=None):
    """Compacted multi-phase march: same results as :func:`march_pallas`,
    far less executed work on divergent batches.

    Single-shot marching pays per-tile max iterations: on the mixed-state
    cornell wavefront the <1% grazing-ray tail (up to ``max_raymarch``
    iterations) lands in nearly every (8,128) tile, so the batch executes
    ~14x the algorithmically needed lane-iterations
    (tools/probe_divergence.py: 55.6M executed / 3.85M needed). This
    wrapper marches everyone a small budget, then repeatedly REPACKS the
    unconverged lanes to the front (stable counting partition — converged
    tiles exit after one convergence check) and resumes them with doubled
    budgets, carrying the exact loop state (t, w, s, d) — per lane the
    iteration sequence is identical to one uninterrupted march, so results
    are bit-equal to ``march_pallas`` while executed work approaches the
    per-lane need. The GPU analog is persistent-threads ray compaction /
    "Shader Execution Reordering"; here it is a host-free XLA
    gather/scatter between pallas_call phases.

    WHY IT CANNOT WIN on this batch shape (measured r4,
    tools/probe_phased_anatomy.py, TPU v5e, cornell 230k rays): a single
    b=32 phase over the full batch costs 2.1 ms — already ~86% of the
    ENTIRE single-shot 512-budget march (2.45 ms), because with chunk=32
    every active tile executes the full 32 iterations before its first
    cross-lane convergence check, and the p50 lane need is only ~16. The
    single-shot's per-tile early exit already stops most tiles after one
    chunk; its divergence waste (13.4M lane-iters executed vs 4.6M needed)
    is bounded by the ceil(tile_max/chunk)*chunk granularity, worth at most
    ~1.5 ms — less than ONE phase's fixed cost, before the ~5 ms/round
    partition+gathers. Compaction could only pay if a phase's fixed cost
    were far below the reclaimable waste, i.e. much larger batches or a
    much longer-tailed need distribution than any reference workload has.
    Kept for the API surface and for such workloads; default OFF
    (config.march_compaction).
    """
    phases = resolve_phases(cfg)
    if len(phases) == 1:
        return march_pallas(scene, origin, direction, cfg, active=active)

    has_bound = cfg.escape_bound and SHAPE.PLANE not in scene.shape_types
    params = pack_scene(scene, escape_bound=has_bound)
    bunny = ((pack_bunny_mxu(scene) if cfg.bunny_mxu else pack_bunny(scene))
             if scene.bunny is not None else None)
    stypes = tuple(scene.shape_types)
    br = float(scene.box_round)
    rp = tuple(scene.rot_perm)

    tile = resolve_tile_rows(cfg) * TILE_COLS
    o_pad, n = _pad_to_tile(origin, tile)
    d_pad, _ = _pad_to_tile(direction, tile)
    num = o_pad.shape[0]
    f32 = o_pad.dtype

    if active is None:
        done = jnp.zeros((num,), jnp.int32).at[n:].set(1)
    else:
        a_pad, _ = _pad_to_tile(active.astype(jnp.int32), tile)
        done = 1 - a_pad  # pad lanes arrive as 0 -> done
    order = jnp.arange(num, dtype=jnp.int32)  # lane position -> ray id
    t = jnp.full((num,), cfg.march_t0, f32)
    w = jnp.full((num,), cfg.omega, f32)
    s = jnp.zeros((num,), f32)
    d = jnp.full((num,), 1e3, f32)
    idx = jnp.zeros((num,), jnp.int32)
    hit = jnp.zeros((num,), bool)
    fin = jnp.zeros((num,), jnp.int32)

    for k, budget in enumerate(phases):
        if k > 0:
            perm = _partition_active(done)
            order, t, w, s, d, idx, hit, fin, done = (
                v[perm] for v in (order, t, w, s, d, idx, hit, fin, done))
        o_cur = o_pad[order]
        d_cur = d_pad[order]
        was_active = done == 0
        t, idx_p, hit_p, fin_p, w, s, d, done = _march_pallas_impl(
            params, bunny, o_cur, d_cur, was_active, stypes, br,
            cfg.replace(max_raymarch=budget), rot_perm=rp,
            has_bound=has_bound, init=(t, w, s, d) if k > 0 else None,
            bunny_mxu=cfg.bunny_mxu)
        # done-at-entry lanes keep their previous result (the kernel writes
        # zeros for them); the budget-capped fin of still-marching lanes
        # accumulates into the total need
        idx = jnp.where(was_active, idx_p, idx)
        hit = jnp.where(was_active, hit_p, hit)
        fin = fin + fin_p

    inv_t = jnp.zeros((num,), f32).at[order].set(t)
    inv_idx = jnp.zeros((num,), jnp.int32).at[order].set(idx)
    inv_hit = jnp.zeros((num,), bool).at[order].set(hit)
    inv_fin = jnp.zeros((num,), jnp.int32).at[order].set(fin)
    return inv_t[:n], inv_idx[:n], inv_hit[:n], inv_fin[:n]
