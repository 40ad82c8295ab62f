"""Produce the SCALING.md per-shard table: per-tile wall time, load
imbalance, end-to-end sharded-vs-single timing.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_report.py [--scene cornell|demo] [--tiles 8]

On real multi-chip hardware the same harness yields the BASELINE.md scaling
number (>85% at 2 hosts); on the virtual CPU mesh the efficiency column is
marked non-meaningful and only the imbalance accounting is load-bearing.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="cornell",
                   choices=["cornell", "cornell_minimal", "demo"])
    p.add_argument("--tiles", type=int, default=None)
    p.add_argument("--scale", type=int, default=4,
                   help="divide the workload resolution by this")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import os

    import jax
    # this image's sitecustomize overrides jax_platforms at import time, so
    # honor JAX_PLATFORMS=cpu explicitly (same dance as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from raytracingpbr_tpu.models import cornell, demo
    from raytracingpbr_tpu.parallel import mesh as meshlib
    from raytracingpbr_tpu.parallel import scaling

    if args.scene == "cornell":
        cfg, scene = cornell.full_config(), cornell.full_scene()
        env, cam = cornell.sky(), cornell.full_camera()
    elif args.scene == "cornell_minimal":
        cfg, scene = cornell.minimal_config(), cornell.minimal_scene()
        env, cam = cornell.sky(), cornell.minimal_camera()
    else:
        cfg, scene = demo.scene_demo_config(), demo.scene_demo_scene()
        env, cam = demo.gradient_environment(), demo.engine_camera()

    w, h = cfg.resolution
    s = args.scale
    cfg = cfg.replace(resolution=(max(w // s // 8 * 8, 8),
                                  max(h // s // 8 * 8, 8)))
    tiles = args.tiles or len(jax.devices())
    mesh = meshlib.make_mesh(tiles=tiles, samples=1)
    for layout in ("contiguous", "strided"):
        rep = scaling.measure(scene, env, cam, cfg, mesh, iters=args.iters,
                              layout=layout)
        print(f"\n### layout={layout}  scene={args.scene} "
              f"res={cfg.resolution} tiles={tiles} virtual={rep.virtual}\n")
        print(rep.table())


if __name__ == "__main__":
    main()
