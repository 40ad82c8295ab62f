"""Microbenchmark TPU row-gather/scatter strategies on (N,) / (N,k) arrays.

tools/probe_reorder.py put a 230k-row (N,3) f32 permutation gather at
~2.8 ms (≈1 GB/s effective — pathological). This probe isolates the op and
tries the standard alternatives so the adaptive-compaction design
(VERDICT r4 item 6) can budget honestly:
  * x[perm] on (N,3) and (N,) and a packed (N,16)
  * jnp.take(..., axis=0)
  * sorted indices (identity-ish) vs random permutation
  * scatter (.at[perm].set)
Run on TPU: python tools/probe_gather.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend(), flush=True)
np.asarray(jnp.ones((8,)) * 2.0)

N = 230400
rng = np.random.default_rng(0)
perm_np = rng.permutation(N).astype(np.int32)
perm = jnp.asarray(perm_np)
near = jnp.asarray(np.clip(np.arange(N) + rng.integers(-64, 64, N),
                           0, N - 1).astype(np.int32))


def timeit(name, f, *args, reps=30):
    out = jax.block_until_ready(f(*args))
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


for k in (1, 3, 16):
    x = jnp.asarray(rng.standard_normal((N, k)).astype(np.float32))
    if k == 1:
        x = x[:, 0]
    g = jax.jit(lambda x, p: x[p])
    timeit(f"x[perm]            (N,{k})", g, x, perm)
    t = jax.jit(lambda x, p: jnp.take(x, p, axis=0))
    timeit(f"take axis0         (N,{k})", t, x, perm)
    timeit(f"x[near-sorted]     (N,{k})", g, x, near)
    s = jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x))
    timeit(f"scatter .at[p].set (N,{k})", s, x, perm)

# fused: permute a whole FrameState-like pytree in one jit
leaves = [jnp.asarray(rng.standard_normal((N, c)).astype(np.float32))
          for c in (3, 3, 3, 4, 4, 2, 3)] + \
         [jnp.asarray(rng.standard_normal((N,)).astype(np.float32))
          for _ in range(5)]
tree_perm = jax.jit(lambda lv, p: [v[p] for v in lv])
timeit("full state pytree (12 leaves)", tree_perm, leaves, perm)
