"""Scaling-efficiency instrumentation for the sharded renderer.

New component (SURVEY.md §5 "Tracing/profiling" applied to the mesh; no
reference analog — the reference is single-GPU). Answers two questions the
BASELINE.md scaling target (">85% rays/s efficiency at 2 hosts") needs
measured:

* **per-shard load imbalance** — ray-tile data parallelism has zero forward
  communication, so the scaling loss is load imbalance: tiles covering
  cheap sky pixels finish their march loops early and wait at the next
  dispatch for tiles covering deep-march geometry. ``tile_imbalance``
  measures each tile's wall time *in isolation* on one device, so the
  numbers are valid even on the 8-virtual-device CPU mesh (where concurrent
  shard timing would be serialized by the host anyway).

* **end-to-end scaling efficiency** — ``scaling_efficiency`` times the
  single-device frame against the sharded frame on the same scene. On real
  multi-chip hardware this is the headline number; on a virtual CPU mesh it
  is only a harness smoke (all "devices" share the host's cores), which the
  report marks with ``virtual=True``.

Output feeds SCALING.md's per-shard table and tools/scaling_report.py.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..core.types import Camera, make_frame_state
from ..ops import integrator as integ
from ..ops.ibl import Environment
from ..ops.scene import Scene
from ..utils.profiling import time_fn
from . import render as prender
from .mesh import TILE_AXIS


@dataclasses.dataclass
class TileStats:
    tile: int
    seconds: float          # steady-state seconds per frame, tile alone
    march_iters: int        # batch-max march trip count (work proxy)


@dataclasses.dataclass
class ScalingReport:
    tiles: List[TileStats]
    imbalance_pct: float    # (max - mean) / mean * 100 over tile times
    t_single: float         # single-device full-frame seconds
    t_sharded: float        # sharded full-frame seconds
    efficiency_pct: float   # t_single / (n_tiles * t_sharded) * 100
    n_tiles: int
    virtual: bool           # CPU-forced mesh: efficiency is not meaningful

    def table(self) -> str:
        """Markdown per-shard table for SCALING.md."""
        mean = np.mean([t.seconds for t in self.tiles])
        lines = ["| tile | s/frame | vs mean | max march iters |",
                 "|---|---|---|---|"]
        for t in self.tiles:
            lines.append(f"| {t.tile} | {t.seconds*1e3:.2f} ms | "
                         f"{t.seconds/mean - 1:+.1%} | {t.march_iters} |")
        lines.append(f"\nLoad imbalance (max-mean)/mean: "
                     f"**{self.imbalance_pct:.1f}%**; sharded frame "
                     f"{self.t_sharded*1e3:.2f} ms vs single "
                     f"{self.t_single*1e3:.2f} ms"
                     + (" (virtual mesh — efficiency not meaningful)"
                        if self.virtual else
                        f"; scaling efficiency {self.efficiency_pct:.1f}%"))
        return "\n".join(lines)


def measure(scene: Scene, env: Environment, cam: Camera, cfg: RenderConfig,
            mesh, iters: int = 5,
            layout: str = "contiguous") -> ScalingReport:
    """Measure per-tile cost and end-to-end scaling on ``mesh``.

    Each tile's pixels are rendered alone (same tile shapes as the sharded
    program, global pixel ids — identical work to its shard) and timed with
    the block-until-ready harness; the march trip count comes from a probe
    step on the tile's respawned rays. ``layout`` picks the pixel-to-tile
    assignment (``render.tile_pixel_ids``) — strided interleaving is the
    load-balance fix this report exists to quantify.
    """
    n = cfg.num_pixels
    tiles = mesh.shape[TILE_AXIS]
    assert n % tiles == 0
    per = n // tiles

    stats: List[TileStats] = []
    for ti in range(tiles):
        pixel_id = prender.tile_pixel_ids(ti, n, tiles, layout)
        state = jax.tree.map(lambda x: x, make_frame_state(per))

        fn = jax.jit(lambda st, pid=pixel_id: integ.render_frame_tile(
            scene, env, cam, st, cfg, pid))
        sec = time_fn(fn, state, warmup=2, iters=iters)

        # work proxy: march trips of this tile's primary rays
        from ..core import rng as rnglib
        from ..ops import camera as cameralib
        from ..ops import march as marchlib
        u = rnglib.uniform4(pixel_id, jnp.uint32(0), 1, cfg.seed)
        uv = cameralib.pixel_uv(pixel_id, cfg.width, cfg.height, u[0], u[1])
        rays = cameralib.get_ray(cam, uv, u[2], u[3])
        res = marchlib.march(scene, rays.origin, rays.direction, cfg,
                             differentiable=False)
        stats.append(TileStats(ti, sec, int(res.iters)))

    times = np.array([t.seconds for t in stats])
    imbalance = float((times.max() - times.mean()) / times.mean() * 100.0)

    # end-to-end: single device vs sharded
    state_s = make_frame_state(n)
    f_single = jax.jit(
        lambda st: integ.render_frame(scene, env, cam, st, cfg))
    t_single = time_fn(f_single, state_s, warmup=2, iters=iters)

    state_m = prender.shard_frame_state(make_frame_state(n), mesh)
    f_shard = jax.jit(lambda st: prender.render_frame_sharded(
        scene, env, cam, st, cfg, mesh, layout=layout))
    t_shard = time_fn(f_shard, state_m, warmup=2, iters=iters)

    virtual = jax.devices()[0].platform == "cpu"
    eff = float(t_single / (tiles * t_shard) * 100.0)
    return ScalingReport(stats, imbalance, t_single, t_shard, eff, tiles,
                         virtual)
