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

Estimator math. The megakernel radiance of a lane is a pure product

    C = color0 * (prod_i s_i) ,   s_i = albedo_i * emission_i   (hit bounce)
                                      | sky(env, direction_i)   (terminal miss)
                                      | roulette_prob_i         (theta-free)

so for any parameter theta,  dC/d theta = sum_i (C / s_i) * d s_i / d theta.
The backward replay recomputes each bounce's state (same RNG counters ->
bit-identical path), forms the per-bounce cotangent  w_i = u / s_i  with
u = g * C (channelwise; guarded where s_i ~ 0, where necessarily u = 0),
and accumulates one tiny VJP of the local factor per bounce.

Scope (detached path sampling, as in Vicini et al. 2021 "Path Replay
Backpropagation"): gradients flow to every parameter entering the throughput
factors — material albedo/emission and environment parameters — which in
THIS renderer's estimator are the only continuous parameter dependencies of
the radiance (lobe/roulette/hit decisions are discrete; the sampled
directions carry no BSDF-value weight because the sampler's weight IS the
albedo). Geometry-transform gradients require the attached scan-AD
estimator (``megakernel_trace(differentiable=True)``) — see
``tests/test_replay.py`` for the equivalence tests between the two on
material/env parameters.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

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


def _bounce_state(static: _Static, scene: Scene, env: Environment,
                  origin, direction, color, alive, pixel_id, i, sample_idx,
                  zcount=None, pnz=None):
    """One megakernel bounce, statement-for-statement equal to
    ``integrator.megakernel_trace``'s body (same RNG streams/counters and
    the same f32 multiplication order, so the replayed path is BIT-EXACT to
    the scan-AD/while forward — asserted by tests/test_replay.py). Returns
    additionally the throughput factor ``s`` with its application masks and
    the hit object index (the replay cotangent inputs).
    """
    cfg = static.cfg
    dtype = color.dtype
    i = jnp.asarray(i, jnp.int32)
    counter = (jnp.asarray(sample_idx, jnp.uint32)
               * jnp.uint32(cfg.max_raytrace) + i.astype(jnp.uint32))

    if cfg.roulette == Roulette.EXP:
        inv_pdf = jnp.exp(i.astype(dtype) / cfg.light_quality)
        roulette_prob = 1.0 - 1.0 / inv_pdf
        u = rnglib.uniform(pixel_id, counter, _S_ROULETTE, cfg.seed, dtype)
        die = u < roulette_prob
        dying = (alive & die)[:, None]
        color = jnp.where(dying, color * roulette_prob, color)
        if pnz is not None:
            # zero-factor bookkeeping (see _replay_bwd): the roulette factor
            # is theta-free but still part of the product
            f = jnp.broadcast_to(roulette_prob, color.shape)
            fz = dying & (f == 0.0)
            pnz = jnp.where(dying & ~fz, pnz * f, pnz)
            zcount = zcount + fz.astype(zcount.dtype)
        alive = alive & ~die

    res = marchlib.march(scene, origin, direction, cfg,
                         differentiable=False, active=alive)

    u4 = rnglib.uniform4(pixel_id, counter, _S_SHADE, cfg.seed, dtype)
    if static.diffuse_only:
        normal = scenelib.calc_normal(scene, res.index, res.position)
        outer = jnp.sum(direction * normal, -1) < 0.0
        normal = jnp.where(outer[:, None], normal, -normal)
        new_dir = rnglib.hemispheric(normal, u4[0], u4[1])
        new_origin = res.position
        color_scale = scenelib.materials_at(scene, res.index).albedo
    else:
        inter = shadelib.ray_surface_interaction(
            scene, res.index, res.position, direction, u4, cfg,
            roughness_fresnel=static.roughness_fresnel,
            restart_at_hit=static.restart_at_hit,
            reflect_kill=static.reflect_kill)
        new_dir, new_origin, color_scale = inter[:3]

    emission = scenelib.materials_at(scene, res.index).emission

    # exact forward arithmetic (megakernel_trace body)
    color_hit = color * color_scale
    intensity = brightness(color_hit)
    color_hit = color_hit * emission
    visible = brightness(color_hit)
    stop_hit = (intensity < visible) | (visible < cfg.visibility[0]) \
        | (visible > cfg.visibility[1])
    color_miss = color * sky_color(env, direction)

    upd = alive
    hit = res.hit
    hit_applied = upd & hit
    miss_applied = upd & ~hit
    color = jnp.where(hit_applied[:, None], color_hit,
                      jnp.where(miss_applied[:, None], color_miss, color))
    new_origin = jnp.where(hit_applied[:, None], new_origin, origin)
    new_direction = jnp.where(hit_applied[:, None], new_dir, direction)
    alive = alive & hit & ~stop_hit

    # factor for the replay cotangent (product form; not used by the carry)
    s = jnp.where(hit_applied[:, None], color_scale * emission,
                  jnp.where(miss_applied[:, None],
                            sky_color(env, direction),
                            jnp.ones_like(color)))
    if pnz is not None:
        applied = (hit_applied | miss_applied)[:, None]
        sz = applied & (s == 0.0)
        pnz = jnp.where(applied & ~sz, pnz * s, pnz)
        zcount = zcount + sz.astype(zcount.dtype)
    return (new_origin, new_direction, color, alive, s, hit_applied,
            miss_applied, res.index, zcount, pnz)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def replay_trace(static: _Static, scene: Scene, env: Environment,
                 origin, direction, color0, pixel_id, sample_idx):
    """Megakernel radiance with path-replay backward. Returns (N, 3) color.

    Forward = the plain early-exit while_loop trace; backward re-simulates
    the path with the same RNG counters and accumulates per-bounce factor
    VJPs (see module docstring). Memory: O(rays), independent of
    ``cfg.max_raytrace`` — runs the reference's 128-512 bounce budgets.
    """
    color, _ = _forward(static, scene, env, origin, direction, color0,
                        pixel_id, sample_idx)
    return color


def _forward(static, scene, env, origin, direction, color0, pixel_id,
             sample_idx):
    """Early-exit forward trace. Also carries the zero-factor bookkeeping
    the backward replay needs: ``zcount`` (per lane-channel count of exactly-
    zero throughput factors, color0 included) and ``pnz`` (the product of the
    NONZERO factors). With them the product rule is exact even at zero
    factors: dC/ds_i = prod_{j != i} s_j, which is pnz when s_i is the only
    zero and 0 when two or more factors are zero — the case the naive
    u/s ratio loses (u = 0 there)."""
    cfg = static.cfg
    max_bounce = cfg.max_raytrace
    zero = origin[:, 0] * 0.0
    c0z = color0 == 0.0
    zcount0 = c0z.astype(jnp.int32)
    pnz0 = jnp.where(c0z, 1.0, color0)

    def w_cond(c):
        i, origin, direction, color, alive, zcount, pnz = c
        return (i < max_bounce) & jnp.any(alive)

    def w_body(c):
        i, origin, direction, color, alive, zcount, pnz = c
        (origin, direction, color, alive, _s, _h, _m, _i, zcount,
         pnz) = _bounce_state(
            static, scene, env, origin, direction, color, alive,
            pixel_id, i, sample_idx, zcount, pnz)
        return i + 1, origin, direction, color, alive, zcount, pnz

    i, o, d, color, alive, zcount, pnz = jax.lax.while_loop(
        w_cond, w_body,
        (jnp.zeros((), jnp.int32), origin, direction, color0, zero < 1.0,
         zcount0, pnz0))
    return color, (zcount, pnz)


def _replay_fwd(static, scene, env, origin, direction, color0, pixel_id,
                sample_idx):
    color, (zcount, pnz) = _forward(static, scene, env, origin, direction,
                                    color0, pixel_id, sample_idx)
    return color, (scene, env, origin, direction, color0, pixel_id,
                   sample_idx, color, zcount, pnz)


def _replay_bwd(static, res, g):
    (scene, env, origin0, direction0, color0, pixel_id, sample_idx, C,
     zcount, pnz) = res
    cfg = static.cfg
    max_bounce = cfg.max_raytrace
    u = g * C          # u / s_i = g * (C with factor i divided out)
    gp = g * pnz       # cotangent for THE single zero factor of a channel
    no_zero = zcount == 0
    one_zero = zcount == 1

    dscene0 = jax.tree.map(jnp.zeros_like, scene)
    denv0 = jax.tree.map(jnp.zeros_like, env)
    zero = origin0[:, 0] * 0.0

    def local_factor(sc, en, direction, index, hit_applied, miss_applied):
        """The bounce's throughput factor as a function of the DIFFERENTIATED
        parameters only (ray state / indices / masks detached)."""
        mat = scenelib.materials_at(sc, index)
        s_hit = mat.albedo * mat.emission
        s_miss = sky_color(en, direction)
        return jnp.where(hit_applied[:, None], s_hit,
                         jnp.where(miss_applied[:, None], s_miss,
                                   jnp.ones_like(s_hit)))

    def w_cond(c):
        i, origin, direction, color, alive, dscene, denv = c
        return (i < max_bounce) & jnp.any(alive)

    def w_body(c):
        i, origin, direction, color, alive, dscene, denv = c
        dir_in = direction
        (origin, direction, color, alive, s, hit_applied,
         miss_applied, index, _zc, _pz) = _bounce_state(
            static, scene, env, origin, dir_in, color, alive,
            pixel_id, i, sample_idx)
        applied = (hit_applied | miss_applied)[:, None]
        # Exact product rule, zero factors included: for a nonzero factor
        # dC/ds = C/s if no factor anywhere is zero (else 0); for THE single
        # zero factor dC/ds = product of all the others = pnz.
        sz = s == 0.0
        w = jnp.where(applied & ~sz & no_zero,
                      u / jnp.where(sz, 1.0, s), 0.0) \
            + jnp.where(applied & sz & one_zero, gp, 0.0)
        _, vjp = jax.vjp(
            lambda sc, en: local_factor(sc, en, dir_in, index,
                                        hit_applied, miss_applied),
            scene, env)
        ds, de = vjp(w)
        dscene = jax.tree.map(jnp.add, dscene, ds)
        denv = jax.tree.map(jnp.add, denv, de)
        return i + 1, origin, direction, color, alive, dscene, denv

    _, _, _, _, _, dscene, denv = jax.lax.while_loop(
        w_cond, w_body,
        (jnp.zeros((), jnp.int32), origin0, direction0, color0,
         zero < 1.0, dscene0, denv0))

    # dC/dcolor0 is diagonal: C / color0 (fresh camera rays have color0 = 1)
    dcolor0 = jnp.where(jnp.abs(color0) > 1e-20, u / color0, 0.0)
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
    static = _Static(cfg, diffuse_only, roughness_fresnel, restart_at_hit,
                     reflect_kill)
    return replay_trace(static, scene, env, rays.origin, rays.direction,
                        rays.color, pixel_id,
                        jnp.asarray(sample_idx, jnp.uint32))
