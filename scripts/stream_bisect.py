"""Bisect the 1M-tri pallas_stream TPU-worker crash (r3).

First real-hardware run of the stream kernel at GRID=708 (1M tris,
depth 15, sub=8) crashed the TPU worker; 201k tris / depth 13 is known
good (scripts/check_stream_parity.py, r3 commit 2f878f1).  A crash
wedges the axon remote-compile service for hours, so: run ONE
configuration per process, chosen by env vars, and log every phase —
the last line before silence identifies the crash point.

    GRID=500 DEPTH= SUB=32 python scripts/stream_bisect.py

Bisection ladder (run in order, stop at first crash):
  1. GRID=500 SUB=32          (500k tris, auto depth 14)   — T probe
  2. GRID=500 DEPTH=15 SUB=32 (forced depth 15)            — depth probe
  3. GRID=708 SUB=32          (1M tris, depth 15)          — the target
  4. GRID=708 SUB=8           (the exact crashed config)   — sub probe
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
import numpy as np

from scenes import heightfield_scene
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.ops.camera import camera_ray


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


GRID = int(os.environ.get("GRID", "500"))
SUB = int(os.environ.get("SUB", "32"))
DEPTH = os.environ.get("DEPTH")
DEPTH = int(DEPTH) if DEPTH else None
RES = int(os.environ.get("RES", "1024"))
npix = RES * RES

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1,
                                      compat=False, bvh_depth=DEPTH)
T = ir["tris"]["verts"].shape[0]
log(f"tris={T} depth={config.bvh_depth} max_leaf={config.bvh_max_leaf} "
    f"sub={SUB}")

idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam = dict(ir["camera"])
cam["bokeh"] = config.bokeh
ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)
bp = ir["bvh_packed"]
log("rays + tables ready; compiling stream kernel")

i, t = traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"], ray_o, ray_d,
                       depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
                       stream=True, sub=SUB)
log("compiled; materializing first execution")
s = float(jnp.sum(t.ravel()[:8]))
log(f"EXEC OK: t[:8] sum = {s}")

hits = int(jnp.sum((i >= 0).astype(jnp.int32)))
log(f"hit count {hits}/{npix}")

t0 = time.time()
for _ in range(3):
    i, t = traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"],
                           ray_o, ray_d, depth=config.bvh_depth,
                           max_leaf=config.bvh_max_leaf, stream=True,
                           sub=SUB)
float(jnp.sum(t.ravel()[:8]))
log(f"3 reps avg {(time.time()-t0)/3*1e3:.1f} ms "
    f"({npix*3/(time.time()-t0)/1e6:.1f} Mrays/s)")
