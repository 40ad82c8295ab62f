"""Path-replay backpropagation for the megakernel integrator.

The scan-AD megakernel (``ops/integrator.megakernel_trace(differentiable=
True)``) differentiates the bounce loop by storing every intermediate — fine
at 4-8 bounces, hopeless at the reference's own budgets (128-512,
``/root/reference/examples/cornell_box/cornell_box.py:19``,
``src/config.py:26``). This module provides the SURVEY §2.4 design instead:
**re-simulate the forward path in the backward pass using the deterministic
counter RNG** (``core/rng.py`` was built for exactly this), so backward
memory is O(rays), independent of bounce depth, and backward cost is ~one
extra forward pass.

Estimator math. The megakernel radiance of a lane is

    C = C_path + sum_i B_i

    C_path = color0 * prod_j s_j ,  s_j = albedo_j * emission_j  (hit bounce)
                                        | sky(env, direction_j)  (final miss)
                                        | roulette_prob_j        (theta-free)
    B_i    = color0 * (prod_{j<i} s_j) * b_i        (NEE bank, env_sampling)
    b_i    = albedo_i * L_env(w_l) * vis * cos/(pi*pdf) * P_diffuse(w_l)

so for any parameter theta

    dC/dtheta = sum_j [ (C_path + sum_{i>j} B_i) / s_j ] * ds_j/dtheta
              + sum_i [ prefix_i ] * db_i/dtheta

— the classic path-replay adjoint: the cotangent of factor s_j is the
radiance collected AFTER bounce j (suffix radiance), and the cotangent of a
bank factor is the arriving throughput. The backward replay recomputes each
bounce's state (same RNG counters -> bit-identical path), forms these
per-bounce cotangents with running prefix sums (suffix = total - prefix,
totals saved as residuals), and accumulates one tiny VJP of the local
factors per bounce. Exactly-zero factors (black albedo, reflect_kill, the
sky-partition zeroing) are handled by zero-count/nonzero-product bookkeeping
so the product rule stays exact where the naive ratio would lose the
gradient (see ``_forward``).

March checkpointing (``cfg.replay_march_checkpoint``): the backward replay
is detached, so the march's only outputs it needs are (t, hit index, hit) —
recording them per bounce in the forward (O(rays * bounces) bytes, ~8/ray/
bounce) lets the backward skip every re-march (sphere tracing dominates
bounce cost) at bit-identical results. Auto-enabled when the buffers fit in
1 GiB.

Scope (detached path sampling, as in Vicini et al. 2021 "Path Replay
Backpropagation"): gradients flow to every parameter entering the throughput
and bank factors — material albedo/emission, environment parameters, and
(through the NEE lobe probability) roughness/metallic/transmission/ior.
Geometry-transform gradients (hit positions, normals) require the attached
scan-AD estimator (``megakernel_trace(differentiable=True)``) — see
``tests/test_replay.py`` for the equivalence tests between the two.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig, Roulette
from ..core import rng as rnglib
from ..core.math import brightness
from ..core.types import Rays
from . import march as marchlib
from . import scene as scenelib
from . import shade as shadelib
from .ibl import Environment, sky_color
from .scene import Scene

# RNG stream ids — MUST match ops/integrator.py
_S_ROULETTE = 0
_S_SHADE = 2


class _Static(NamedTuple):
    """Hashable trace options (jax.custom_vjp nondiff argument)."""
    cfg: RenderConfig
    diffuse_only: bool
    roughness_fresnel: bool
    restart_at_hit: bool
    reflect_kill: bool = False
    checkpoint: bool = False


class _BounceOut(NamedTuple):
    """Everything one replayed bounce produces (forward or backward)."""
    origin: jax.Array
    direction: jax.Array
    color: jax.Array        # throughput AFTER this bounce's factor
    alive: jax.Array
    s: jax.Array            # (N, 3) this bounce's throughput factor
    hit_applied: jax.Array  # (N,) the hit factor was applied
    miss_applied: jax.Array  # (N,) the miss (sky) factor was applied
    index: jax.Array        # (N,) hit object index
    zcount: jax.Array       # running zero-factor count (or None)
    pnz: jax.Array          # running nonzero-factor product (or None)
    killed: jax.Array       # (N,) reflect_kill mask at this vertex
    t: jax.Array            # (N,) march t (checkpoint record)
    hit: jax.Array          # (N,) march hit (checkpoint record)
    # env_sampling only (None otherwise):
    sky_w: Optional[jax.Array]      # updated next-segment sky weight
    sky_mask: Optional[jax.Array]   # (N,) the sky weight applied to THIS
    #                                 bounce's sky factor (for the local VJP;
    #                                 detached — MIS weights sum to 1)
    gate: Optional[jax.Array]       # (N,) NEE bank gate
    vis: Optional[jax.Array]        # (N,) NEE shadow visibility
    bank: Optional[jax.Array]       # (N, 3) banked radiance (gate applied)
    bz: Optional[jax.Array]         # (N, 3) single-zero-prefix bank term
    normal: Optional[jax.Array]     # (N, 3) faced normal (NEE local VJP)
    outer: Optional[jax.Array]      # (N,) sidedness bit (NEE local VJP)


def _counter(cfg, sample_idx, i):
    return (jnp.asarray(sample_idx, jnp.uint32)
            * jnp.uint32(cfg.max_raytrace) + i.astype(jnp.uint32))


def _nee_comp(cfg, i, dtype):
    """The truncation compensation applied to the NEE bank
    (integrator.megakernel_trace: EXP-roulette survival of the paired
    continuation)."""
    if cfg.roulette == Roulette.EXP:
        return jnp.exp(-(i.astype(dtype) + 1.0) / cfg.light_quality)
    return None


def _bounce_state(static: _Static, scene: Scene, env: Environment,
                  origin, direction, color, alive, pixel_id, i, sample_idx,
                  zcount=None, pnz=None, prev_sky_w=None,
                  march_rec=None, vis_rec=None) -> _BounceOut:
    """One megakernel bounce, statement-for-statement equal to
    ``integrator.megakernel_trace``'s body (same RNG streams/counters and
    the same f32 multiplication order, so the replayed path is BIT-EXACT to
    the scan-AD/while forward — asserted by tests/test_replay.py). Returns
    the throughput factor ``s`` with its application masks, the NEE bank
    pieces under ``cfg.env_sampling``, and the march record.

    ``march_rec=(t, enc)``: recorded march for this bounce — skips the
    sphere trace (``enc >= 0`` means hit object ``enc``). ``vis_rec``: the
    recorded NEE shadow visibility — skips the shadow march.
    """
    cfg = static.cfg
    dtype = color.dtype
    i = jnp.asarray(i, jnp.int32)
    counter = _counter(cfg, sample_idx, i)

    if cfg.roulette == Roulette.EXP:
        inv_pdf = jnp.exp(i.astype(dtype) / cfg.light_quality)
        roulette_prob = 1.0 - 1.0 / inv_pdf
        u = rnglib.uniform(pixel_id, counter, _S_ROULETTE, cfg.seed, dtype)
        die = u < roulette_prob
        dying = (alive & die)[:, None]
        color = jnp.where(dying, color * roulette_prob, color)
        if pnz is not None:
            # zero-factor bookkeeping (see _forward): the roulette factor
            # is theta-free but still part of the product
            f = jnp.broadcast_to(roulette_prob, color.shape)
            fz = dying & (f == 0.0)
            pnz = jnp.where(dying & ~fz, pnz * f, pnz)
            zcount = zcount + fz.astype(zcount.dtype)
        alive = alive & ~die

    if march_rec is None:
        res = marchlib.march(scene, origin, direction, cfg,
                             differentiable=False, active=alive)
        m_t, m_idx, m_hit = res.t, res.index, res.hit
        m_pos = res.position
    else:
        m_t, enc = march_rec
        m_hit = enc >= 0
        m_idx = jnp.maximum(enc, 0)
        m_pos = origin + m_t[:, None] * direction

    u4 = rnglib.uniform4(pixel_id, counter, _S_SHADE, cfg.seed, dtype)
    if static.diffuse_only:
        normal = scenelib.calc_normal(scene, m_idx, m_pos)
        outer = jnp.sum(direction * normal, -1) < 0.0
        normal = jnp.where(outer[:, None], normal, -normal)
        new_dir = rnglib.hemispheric(normal, u4[0], u4[1])
        new_origin = m_pos
        color_scale = scenelib.materials_at(scene, m_idx).albedo
        killed = jnp.zeros_like(m_hit)
        diff_lobe = jnp.ones_like(m_hit)
        refl_lobe = jnp.zeros_like(m_hit)
        outer_bit = jnp.ones_like(m_hit)
    else:
        inter = shadelib.ray_surface_interaction(
            scene, m_idx, m_pos, direction, u4, cfg,
            roughness_fresnel=static.roughness_fresnel,
            restart_at_hit=static.restart_at_hit,
            reflect_kill=static.reflect_kill)
        new_dir, new_origin, color_scale = inter[:3]
        normal, diff_lobe = inter.normal, inter.diffuse
        killed, outer_bit = inter.killed, inter.outer
        refl_lobe = inter.reflect

    emission = scenelib.materials_at(scene, m_idx).emission

    # exact forward arithmetic (megakernel_trace body)
    color_hit = color * color_scale
    intensity = brightness(color_hit)
    color_hit = color_hit * emission
    visible = brightness(color_hit)
    stop_hit = (intensity < visible) | (visible < cfg.visibility[0]) \
        | (visible > cfg.visibility[1])
    color_miss = color * sky_color(env, direction)

    upd = alive
    hit = m_hit

    sky_mask = gate = vis = bank = bz = None
    if cfg.env_sampling:
        from . import integrator as _integ  # no cycle: lazy both ways
        sky_mask = prev_sky_w
        color_miss = color_miss * sky_mask[:, None]
        gate = upd & hit & ~stop_hit & (i < cfg.max_raytrace - 1)
        nee_albedo = scenelib.materials_at(scene, m_idx).albedo
        if static.diffuse_only:
            side = jnp.ones_like(gate)
            nee, vis = _integ._nee_env(
                scene, env, m_idx, m_pos, direction, normal, side,
                nee_albedo, gate, pixel_id, counter, cfg, lobe_prob=False,
                visible_rec=vis_rec)
        else:
            nee, vis = _integ._nee_env(
                scene, env, m_idx, m_pos, direction, normal, outer_bit,
                nee_albedo, gate, pixel_id, counter, cfg,
                roughness_fresnel=static.roughness_fresnel,
                visible_rec=vis_rec, reflect_kill=static.reflect_kill)
        comp = _nee_comp(cfg, i, dtype)
        if comp is not None:
            nee = nee * comp
        bank = jnp.where(gate[:, None], color * nee, 0.0)
        if pnz is not None:
            # single-zero-prefix bank derivative: if the prefix product has
            # EXACTLY one zero factor, d(bank)/d(that factor) = product of
            # the other (nonzero) prefix factors times the bank factor
            bz = jnp.where((zcount == 1) & gate[:, None], pnz * nee, 0.0)
        nsw = jnp.ones_like(prev_sky_w)
        if cfg.mis_specular and not static.diffuse_only:
            from .ibl import env_pdf
            ps_b = shadelib.specular_env_density(
                scene, m_idx, direction, normal, outer_bit, new_dir, cfg,
                roughness_fresnel=static.roughness_fresnel,
                reflect_kill=static.reflect_kill)
            w_b = jax.lax.stop_gradient(
                ps_b / jnp.maximum(env_pdf(env, new_dir) + ps_b, 1e-20))
            nsw = jnp.where(refl_lobe, w_b, nsw)
        nsw = jnp.where(diff_lobe, jnp.zeros_like(nsw), nsw)
        prev_sky_w = jnp.where(
            upd, jnp.where(gate, nsw, jnp.ones_like(nsw)), prev_sky_w)

    color = jnp.where((upd & hit)[:, None], color_hit,
                      jnp.where((upd & ~hit)[:, None], color_miss, color))
    new_origin = jnp.where((upd & hit)[:, None], new_origin, origin)
    new_direction = jnp.where((upd & hit)[:, None], new_dir, direction)
    hit_applied = upd & hit
    miss_applied = upd & ~hit
    alive = alive & hit & ~stop_hit

    # factor for the replay cotangent (product form; not used by the carry)
    s_miss = sky_color(env, direction)
    if sky_mask is not None:
        s_miss = s_miss * sky_mask.astype(s_miss.dtype)[:, None]
    s = jnp.where(hit_applied[:, None], color_scale * emission,
                  jnp.where(miss_applied[:, None], s_miss,
                            jnp.ones_like(color)))
    if pnz is not None:
        applied = (hit_applied | miss_applied)[:, None]
        sz = applied & (s == 0.0)
        pnz = jnp.where(applied & ~sz, pnz * s, pnz)
        zcount = zcount + sz.astype(zcount.dtype)
    return _BounceOut(new_origin, new_direction, color, alive, s,
                      hit_applied, miss_applied, m_idx, zcount, pnz,
                      killed, m_t, m_hit, prev_sky_w, sky_mask, gate, vis,
                      bank, bz, normal, outer_bit)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def replay_trace(static: _Static, scene: Scene, env: Environment,
                 origin, direction, color0, pixel_id, sample_idx):
    """Megakernel radiance with path-replay backward. Returns (N, 3) color.

    Forward = the plain early-exit while_loop trace; backward re-simulates
    the path with the same RNG counters and accumulates per-bounce factor
    VJPs (see module docstring). Memory: O(rays) (plus the optional march
    checkpoint), independent of ``cfg.max_raytrace`` — runs the reference's
    128-512 bounce budgets.
    """
    color, aux = _forward(static, scene, env, origin, direction, color0,
                          pixel_id, sample_idx)
    if static.cfg.env_sampling:
        color = color + aux["bank_tot"]
    return color


def _forward(static, scene, env, origin, direction, color0, pixel_id,
             sample_idx):
    """Early-exit forward trace. Also carries the zero-factor bookkeeping
    the backward replay needs: ``zcount`` (per lane-channel count of exactly-
    zero throughput factors, color0 included) and ``pnz`` (the product of the
    NONZERO factors). With them the product rule is exact even at zero
    factors: dC/ds_i = prod_{j != i} s_j, which is pnz when s_i is the only
    zero and 0 when two or more factors are zero — the case the naive
    u/s ratio loses (u = 0 there).

    Under ``cfg.env_sampling`` additionally accumulates the NEE bank total
    and its single-zero companion ``bz_tot`` (suffix sums in the backward
    are formed as total - running prefix). With ``static.checkpoint``,
    records (t, hit-index[, NEE visibility]) per bounce so the backward
    replay skips every march.
    """
    cfg = static.cfg
    max_bounce = cfg.max_raytrace
    n = origin.shape[0]
    env_s = cfg.env_sampling
    zero = origin[:, 0] * 0.0
    c0z = color0 == 0.0
    zcount0 = c0z.astype(jnp.int32)
    pnz0 = jnp.where(c0z, 1.0, color0)

    carry0 = dict(
        i=jnp.zeros((), jnp.int32), origin=origin, direction=direction,
        color=color0, alive=zero < 1.0, zcount=zcount0, pnz=pnz0)
    if env_s:
        carry0.update(sky_w=zero + 1.0,
                      bank_tot=jnp.zeros_like(color0),
                      bz_tot=jnp.zeros_like(color0))
    if static.checkpoint:
        carry0.update(t_buf=jnp.zeros((max_bounce, n), origin.dtype),
                      enc_buf=jnp.full((max_bounce, n), -1, jnp.int32))
        if env_s:
            carry0.update(vis_buf=jnp.zeros((max_bounce, n), bool))

    def w_cond(c):
        return (c["i"] < max_bounce) & jnp.any(c["alive"])

    def w_body(c):
        i = c["i"]
        out = _bounce_state(
            static, scene, env, c["origin"], c["direction"], c["color"],
            c["alive"], pixel_id, i, sample_idx, c["zcount"], c["pnz"],
            prev_sky_w=c.get("sky_w"))
        c = dict(c, i=i + 1, origin=out.origin, direction=out.direction,
                 color=out.color, alive=out.alive, zcount=out.zcount,
                 pnz=out.pnz)
        if env_s:
            c.update(sky_w=out.sky_w,
                     bank_tot=c["bank_tot"] + out.bank,
                     bz_tot=c["bz_tot"] + out.bz)
        if static.checkpoint:
            enc = jnp.where(out.hit, out.index, -1)
            c.update(
                t_buf=jax.lax.dynamic_update_index_in_dim(
                    c["t_buf"], out.t, i, 0),
                enc_buf=jax.lax.dynamic_update_index_in_dim(
                    c["enc_buf"], enc, i, 0))
            if env_s:
                c.update(vis_buf=jax.lax.dynamic_update_index_in_dim(
                    c["vis_buf"], out.vis, i, 0))
        return c

    out = jax.lax.while_loop(w_cond, w_body, carry0)
    aux = {k: out[k] for k in out
           if k in ("zcount", "pnz", "bank_tot", "bz_tot", "t_buf",
                    "enc_buf", "vis_buf")}
    return out["color"], aux


def _replay_fwd(static, scene, env, origin, direction, color0, pixel_id,
                sample_idx):
    color, aux = _forward(static, scene, env, origin, direction, color0,
                          pixel_id, sample_idx)
    total = color + aux["bank_tot"] if static.cfg.env_sampling else color
    return total, (scene, env, origin, direction, color0, pixel_id,
                   sample_idx, color, aux)


def _replay_bwd(static, res, g):
    (scene, env, origin0, direction0, color0, pixel_id, sample_idx, C,
     aux) = res
    cfg = static.cfg
    env_s = cfg.env_sampling
    max_bounce = cfg.max_raytrace
    zcount, pnz = aux["zcount"], aux["pnz"]
    u = g * C          # u / s_i = g * (C_path with factor i divided out)
    gp = g * pnz       # cotangent for THE single zero factor of a channel
    no_zero = zcount == 0
    one_zero = zcount == 1
    if env_s:
        bank_tot, bz_tot = aux["bank_tot"], aux["bz_tot"]

    dscene0 = jax.tree.map(jnp.zeros_like, scene)
    denv0 = jax.tree.map(jnp.zeros_like, env)
    zero = origin0[:, 0] * 0.0

    carry0 = dict(
        i=jnp.zeros((), jnp.int32), origin=origin0, direction=direction0,
        color=color0, alive=zero < 1.0,
        zcount=(color0 == 0.0).astype(jnp.int32),
        pnz=jnp.where(color0 == 0.0, 1.0, color0),
        dscene=dscene0, denv=denv0)
    if env_s:
        carry0.update(sky_w=zero + 1.0,
                      bank_pre=jnp.zeros_like(color0),
                      bz_pre=jnp.zeros_like(color0))

    def w_cond(c):
        return (c["i"] < max_bounce) & jnp.any(c["alive"])

    def w_body(c):
        i = c["i"]
        dir_in = c["direction"]
        march_rec = vis_rec = None
        if static.checkpoint:
            march_rec = (
                jax.lax.dynamic_index_in_dim(aux["t_buf"], i, 0, False),
                jax.lax.dynamic_index_in_dim(aux["enc_buf"], i, 0, False))
            if env_s:
                vis_rec = jax.lax.dynamic_index_in_dim(
                    aux["vis_buf"], i, 0, False)
        out = _bounce_state(
            static, scene, env, c["origin"], dir_in, c["color"], c["alive"],
            pixel_id, i, sample_idx, c["zcount"], c["pnz"],
            prev_sky_w=c.get("sky_w"), march_rec=march_rec,
            vis_rec=vis_rec)

        applied = (out.hit_applied | out.miss_applied)[:, None]
        sz = out.s == 0.0
        # Exact product rule for the PATH product, zero factors included:
        # for a nonzero factor dC_path/ds = C_path/s if no factor anywhere
        # is zero (else 0); for THE single zero factor dC_path/ds = product
        # of all the others = pnz.
        w = jnp.where(applied & ~sz & no_zero,
                      u / jnp.where(sz, 1.0, out.s), 0.0) \
            + jnp.where(applied & sz & one_zero, gp, 0.0)
        if env_s:
            # Bank suffix: factor s_i multiplies every bank k > i, so its
            # cotangent gains g * (sum_{k>i} B_k) / s_i — suffix formed as
            # total minus the running prefix (which includes this bounce's
            # own bank: B_i does NOT contain s_i). Zero factors: a bank
            # whose product has a zero elsewhere is itself 0 and its ratio
            # correctly vanishes; when s_i IS the unique zero so far, the
            # exact derivative is the bz suffix (nonzero-prefix product *
            # bank factor).
            bank_pre = c["bank_pre"] + out.bank
            bz_pre = c["bz_pre"] + out.bz
            w = w + jnp.where(applied & ~sz,
                              g * (bank_tot - bank_pre)
                              / jnp.where(sz, 1.0, out.s), 0.0) \
                + jnp.where(applied & sz & (out.zcount == 1),
                            g * (bz_tot - bz_pre), 0.0)

        counter = _counter(cfg, sample_idx, jnp.asarray(i, jnp.int32))
        comp = _nee_comp(cfg, i, origin0.dtype)

        def local(sc, en):
            """The bounce's differentiable local factors as a function of
            the DIFFERENTIATED parameters only (ray state / indices /
            masks / sampled directions detached)."""
            mat = scenelib.materials_at(sc, out.index)
            kill_f = (~out.killed).astype(mat.albedo.dtype)[:, None]
            s_hit = mat.albedo * mat.emission * kill_f
            s_miss = sky_color(en, dir_in)
            if out.sky_mask is not None:
                s_miss = s_miss * out.sky_mask.astype(
                    s_miss.dtype)[:, None]
            s = jnp.where(out.hit_applied[:, None], s_hit,
                          jnp.where(out.miss_applied[:, None], s_miss,
                                    jnp.ones_like(s_hit)))
            if not env_s:
                return (s,)
            from . import integrator as _integ
            if static.diffuse_only:
                b, _ = _integ._nee_env(
                    sc, en, out.index, jnp.zeros_like(dir_in), dir_in,
                    out.normal, jnp.ones_like(out.gate), mat.albedo,
                    out.gate, pixel_id, counter, cfg, lobe_prob=False,
                    visible_rec=out.vis)
            else:
                b, _ = _integ._nee_env(
                    sc, en, out.index, jnp.zeros_like(dir_in), dir_in,
                    out.normal, out.outer, mat.albedo, out.gate,
                    pixel_id, counter, cfg,
                    roughness_fresnel=static.roughness_fresnel,
                    visible_rec=out.vis, reflect_kill=static.reflect_kill)
            if comp is not None:
                b = b * comp
            return (s, jnp.where(out.gate[:, None], b, 0.0))

        if env_s:
            # cotangent of the bank factor b_i: the arriving throughput
            # (the prefix value, zeros included) — bank = color_pre * b_i
            w_b = g * jnp.where(out.gate[:, None], c["color"], 0.0)
            _, vjp = jax.vjp(local, scene, env)
            ds, de = vjp((w, w_b))
        else:
            _, vjp = jax.vjp(local, scene, env)
            ds, de = vjp((w,))

        def acc(a, b):
            # integer/bool leaves (env alias table) come back as float0
            # cotangents — keep the accumulator's zeros for them
            if getattr(b, "dtype", None) == jax.dtypes.float0:
                return a
            return jnp.add(a, b)

        c = dict(c, i=i + 1, origin=out.origin, direction=out.direction,
                 color=out.color, alive=out.alive, zcount=out.zcount,
                 pnz=out.pnz,
                 dscene=jax.tree.map(acc, c["dscene"], ds),
                 denv=jax.tree.map(acc, c["denv"], de))
        if env_s:
            c.update(sky_w=out.sky_w, bank_pre=bank_pre,
                     bz_pre=bz_pre)
        return c

    out = jax.lax.while_loop(w_cond, w_body, carry0)
    dscene, denv = out["dscene"], out["denv"]

    # custom_vjp cotangents for integer/bool primal leaves must be float0
    def f0_int(primal, ct):
        if (jnp.issubdtype(primal.dtype, jnp.integer)
                or primal.dtype == jnp.bool_):
            return np.zeros(primal.shape, jax.dtypes.float0)
        return ct
    dscene = jax.tree.map(f0_int, scene, dscene)
    denv = jax.tree.map(f0_int, env, denv)

    # dC/dcolor0 is diagonal: (C_path + banks) / color0 (fresh camera rays
    # have color0 = 1)
    u_tot = u + (g * bank_tot if env_s else 0.0)
    dcolor0 = jnp.where(jnp.abs(color0) > 1e-20, u_tot / color0, 0.0)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (dscene, denv, jnp.zeros_like(origin0),
            jnp.zeros_like(direction0), dcolor0, f0(pixel_id),
            f0(sample_idx))


replay_trace.defvjp(_replay_fwd, _replay_bwd)


def trace_replay(scene: Scene, env: Environment, rays: Rays,
                 pixel_id: jax.Array, sample_idx, cfg: RenderConfig,
                 diffuse_only: bool = False,
                 roughness_fresnel: bool = True,
                 restart_at_hit: bool = True,
                 reflect_kill: bool = False) -> jax.Array:
    """Convenience wrapper matching ``megakernel_trace``'s signature subset.
    Returns the (N, 3) radiance with path-replay gradients."""
    checkpoint = cfg.replay_march_checkpoint
    if checkpoint is None:
        # auto: record (t f32 + enc i32 [+ vis bool]) when it fits in 1 GiB
        per = 8 + (1 if cfg.env_sampling else 0)
        checkpoint = (cfg.max_raytrace * rays.origin.shape[0] * per
                      <= (1 << 30))
    static = _Static(cfg, diffuse_only, roughness_fresnel, restart_at_hit,
                     reflect_kill, bool(checkpoint))
    return replay_trace(static, scene, env, rays.origin, rays.direction,
                        rays.color, pixel_id,
                        jnp.asarray(sample_idx, jnp.uint32))
