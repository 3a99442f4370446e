"""A/B the direction-major sort key (config.sort_dir_major) on the real
integrator — the r3 option that shipped unmeasured (VERDICT r3 weak #7).

Times render_samples_jit on the 66k bench scene with the per-bounce sort
keyed position-major (default: Morton(position) + direction octant in
the low bits) vs direction-major (octant in the HIGH bits: pure-octant
tiles, better for the any-hit shadow pass, worse spatial compactness).

Run: REPS=8 python -u scripts/ab_dirmajor.py | tee .runlogs/ab_dirmajor.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from scenes import heightfield_scene
from elevenrender_tpu.render.integrator import init_state, render_samples_jit

GRID = int(os.environ.get("GRID", "182"))
RES = int(os.environ.get("RES", "1024"))
REPS = int(os.environ.get("REPS", "8"))

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1,
                                      compat=False)
rays = 2.0 * config.max_bounces * RES * RES


def timeit(label, cfg):
    state = init_state(cfg)
    state = render_samples_jit(cfg, ir, state, 2)  # compile + warm
    float(jnp.sum(state["samples"]))
    t0 = time.time()
    state = render_samples_jit(cfg, ir, state, REPS)
    float(jnp.sum(state["samples"]))
    dt = (time.time() - t0) / REPS
    print(f"{label:36s} {dt*1e3:8.1f} ms/sample ({rays/dt/1e6:.2f} Mrays/s)",
          flush=True)
    return dt

# Cell order matters: the tunnel transient (docs/PERF.md) pollutes the
# first ~60 s of device use, and a compile gap may re-arm it — so run
# BOTH configs once as sacrificial warm-ups, then the measured pair.
timeit("position-major [transient burn]", config)
timeit("direction-major [transient burn]",
       config.replace(sort_dir_major=True))
a = timeit("position-major (default)", config)
b = timeit("direction-major (sort_dir_major)",
           config.replace(sort_dir_major=True))
print(f"dir-major vs position-major: {b / a:.3f}x "
      f"(<1 = dir-major wins)", flush=True)
