"""Progressive renderer daemon: the reference's live loop
(``src/main.py:24-68`` / ``src/renderer.py:25-32``) without the GUI — on a
TPU host the primary UX is headless (SURVEY.md §7.1 "ti.ui"): accumulate
wavefront samples, periodically write the tonemapped framebuffer + a
checkpoint, resume bit-exactly after preemption.

Usage:
    python -m raytracingpbr_tpu.apps.progressive --scene demo \
        --minutes 2 --out out/progressive
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..core.types import make_frame_state
from ..io import checkpoint as ckpt
from ..io import image as imageio
from ..ops import integrator as integ
from ..utils.profiling import MetricsLogger


def run(scene, env, cam, cfg, out_dir: str, minutes: float = 1.0,
        save_every: int = 50, exposure: float = 1.0,
        metrics_path: str | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "state.npz")
    if os.path.exists(ckpt_path):
        state, meta = ckpt.load(ckpt_path)
        state = jax.tree.map(jax.numpy.asarray, state)
        print(f"resumed from frame {int(state.frame)}", flush=True)
    else:
        state = make_frame_state(cfg.num_pixels)

    frame = jax.jit(lambda st: integ.render_frame(scene, env, cam, st, cfg,
                                                  exposure=exposure))
    log = MetricsLogger(metrics_path)
    deadline = time.time() + minutes * 60
    pixels = None
    while time.time() < deadline:
        t0 = time.time()
        pixels, state = frame(state)
        jax.block_until_ready(pixels)
        dt = time.time() - t0
        f = int(state.frame)
        log.frame_stats(np.asarray(pixels), np.asarray(state.accum), dt,
                        frame=f)
        if f % save_every == 0:
            img = np.asarray(pixels).reshape(
                cfg.width, cfg.height, 3).transpose(1, 0, 2)[::-1]
            imageio.write_png(os.path.join(out_dir, "latest.png"), img)
            ckpt.save(ckpt_path, state, meta={"frame": f})
    if pixels is not None:
        img = np.asarray(pixels).reshape(
            cfg.width, cfg.height, 3).transpose(1, 0, 2)[::-1]
        imageio.write_png(os.path.join(out_dir, "final.png"), img)
        ckpt.save(ckpt_path, state, meta={"frame": int(state.frame)})
    log.close()


def main(argv=None):
    from ..models import cornell, demo

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="demo", choices=["demo", "cornell"])
    p.add_argument("--minutes", type=float, default=1.0)
    p.add_argument("--out", default="out/progressive")
    p.add_argument("--metrics", default=None)
    args = p.parse_args(argv)

    if args.scene == "demo":
        scene, cfg = demo.engine_scene(), demo.engine_config()
        cam, env = demo.engine_camera(), demo.engine_environment()
        exposure = 1.0
    else:
        scene, cfg = cornell.full_scene(), cornell.full_config()
        cam, env = cornell.full_camera(), cornell.sky()
        exposure = 0.6
    run(scene, env, cam, cfg, args.out, minutes=args.minutes,
        exposure=exposure, metrics_path=args.metrics)


if __name__ == "__main__":
    main()
