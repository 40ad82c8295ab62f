"""Bisect the replay+NEE backward cost (round 5).

The NEE ingredient fixes (one-hot env fetches: _nee_env 11.2 -> 4.3 ms;
shadow diet: visibility march halved) left the replay+NEE grad step at
0.438 Msps — unchanged from r4. This probe toggles the suspects one at a
time on the bench workload (230k rays, 128 bounces):
  * forward-only (no grad) with env_sampling on/off — is the tax fwd or bwd
  * mis_specular off — the balance-heuristic density/env_pdf chain
  * shadow budget 32 — the visibility march
  * replay_march_checkpoint off — checkpoint memory traffic
Run on TPU: python tools/probe_replay_nee.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import raytracingpbr_tpu as rt
from raytracingpbr_tpu.models import cornell
from raytracingpbr_tpu.ops import ibl as ibllib
from raytracingpbr_tpu.parallel import train as ptrain

print("backend:", jax.default_backend(), flush=True)
np.asarray(jnp.ones((8,)) * 2.0)

scene = cornell.full_scene()
cam = cornell.full_camera()
base = cornell.full_config().replace(max_raytrace=128, env_sampling=True)
img = np.full((64, 32, 3), 0.05, np.float32)
img[40:44, 24:28] = 25.0
env = ibllib.with_env_sampler(
    rt.hdr_environment(jnp.asarray(img), prebake=False))
n = base.num_pixels
pid = jnp.arange(n, dtype=jnp.uint32)
target = jnp.zeros((n, 3))


def run(name, cfg, grad=True, reps=3):
    @jax.jit
    def step(sc, s):
        def loss(sc):
            im = ptrain.render_pixels(sc, env, cam, pid, cfg, spp=1,
                                      sample_offset=s,
                                      differentiable="replay")
            return jnp.mean((im - target) ** 2)
        if grad:
            return jax.grad(loss)(sc).albedo
        return loss(sc)

    jax.block_until_ready(step(scene, jnp.uint32(0)))
    t0 = time.time()
    for i in range(1, reps + 1):
        g = step(scene, jnp.uint32(i))
    jax.block_until_ready(g)
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt*1e3:8.1f} ms/step  {n/dt/1e6:7.3f} Msps",
          flush=True)


run("fwd only, NEE on", base, grad=False)
run("fwd only, NEE off", base.replace(env_sampling=False), grad=False)
run("fwd+bwd, NEE on (baseline)", base)
run("fwd+bwd, NEE, mis_specular off", base.replace(mis_specular=False))
run("fwd+bwd, NEE, shadow budget 32",
    base.replace(shadow_max_raymarch=32))
run("fwd+bwd, NEE, march checkpoint OFF",
    base.replace(replay_march_checkpoint=False))
run("fwd+bwd, NEE off (reference)", base.replace(env_sampling=False))
