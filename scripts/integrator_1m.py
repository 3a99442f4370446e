"""Full-integrator composition ladder at 1M tris (r4, VERDICT ask #1).

Reproduces the r3 bench_1m crash shape incrementally: the REAL
integrator (sorts + gathers + shading + both stream trace variants) on
the plain 1M-tri heightfield, trace_mode FORCED to pallas_stream
(bypassing the auto clamp), with NSAMP progressive samples in ONE
dispatch (render_samples_jit).  r3 crashed at NSAMP=8 in its single
attempt; scripts/multilaunch.py has since cleared raw stream traversals
up to N=240 executions per dispatch, so this ladder isolates what the
integrator ADDS.

    NSAMP=1 python scripts/integrator_1m.py
    NSAMP=2 ... 4 ... 8   (one process per rung; a crash wedges compiles
                           but cached executables keep working)
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

from scenes import heightfield_scene, textured_heightfield_scene
from elevenrender_tpu.render.integrator import init_state, render_samples_jit


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


GRID = int(os.environ.get("GRID", "708"))
RES = int(os.environ.get("RES", "1024"))
NSAMP = int(os.environ.get("NSAMP", "1"))
TEXTURED = bool(int(os.environ.get("TEXTURED", "0")))

maker = textured_heightfield_scene if TEXTURED else heightfield_scene
scene, config, ir = maker(grid=GRID, res=RES, spp=NSAMP, compat=False)
config = config.replace(
    trace_mode=os.environ.get("TRACE", "pallas_stream"))
T = ir["tris"]["verts"].shape[0]
log(f"tris={T} depth={config.bvh_depth} NSAMP={NSAMP} textured={TEXTURED} "
    f"(forced pallas_stream)")

state = init_state(config)
log("compiling + first dispatch")
t0 = time.time()
state = render_samples_jit(config, ir, state, NSAMP)
s = float(jnp.sum(state["samples"]))
log(f"EXEC OK: {NSAMP} samples in one dispatch, total {time.time()-t0:.1f}s "
    f"(compile incl), samples-sum={s:.0f}")

t0 = time.time()
state = render_samples_jit(config, ir, state, NSAMP)
float(jnp.sum(state["samples"]))
dt = time.time() - t0
rays = 2.0 * config.max_bounces * RES * RES * NSAMP
log(f"EXEC2 OK: dispatch wall {dt:.1f}s ({dt/NSAMP:.1f} s/sample, "
    f"{rays/dt/1e6:.2f} Mrays/s fixed-unit)")
