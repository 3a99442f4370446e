"""Frontier-K walk A/B + the 8-wide kernel's fate, on the real chip
(r4: VERDICT asks #2 and #8).

Stage 1 (VMEM, 66k tris): binary vs frontier-{2,4,8} at sub={8,32},
coherent and sorted-incoherent 1M rays — does batching K stack entries
per serialized step cut the walk cost the r3 roofline pinned?

Stage 2 (stream, 318k and 1M tris): pallas_stream vs pallas_wide_stream
vs frontier-4 stream on coherent rays — the 8-wide kernel's one
plausible win is 3x fewer leaf-parent visits = 3x fewer DMA bursts at
scale; this measurement decides whether it becomes the stream default
or moves to experiments/.

Each (kernel, sub, scene) cell is REPS timed executions after a
20 s duration burn-in (the tunnel transient is time-based, docs/PERF.md).
Run: REPS=3 python -u scripts/sweep_frontier.py | tee .runlogs/sweep_frontier.log
Stages/cells are independent; a crash loses only what follows (order:
cheapest evidence first).
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
from elevenrender_tpu.ops.bvh_pallas import traverse_pallas
from elevenrender_tpu.experiments.bvh_wide import (pack_bvh_wide,
                                                       traverse_wide)
from elevenrender_tpu.ops.camera import camera_ray
from elevenrender_tpu.ops.sort import sort_for_packets

REPS = int(os.environ.get("REPS", "3"))
RES = int(os.environ.get("RES", "1024"))
npix = RES * RES
interp = jax.default_backend() == "cpu"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make(grid):
    scene, config, ir = heightfield_scene(grid=grid, res=RES, spp=1,
                                          compat=False)
    idx = jnp.arange(npix, dtype=jnp.int32)
    px, py = idx % RES, idx // RES
    z = jnp.full((npix,), 0.5, jnp.float32)
    cam = dict(ir["camera"])
    cam["bokeh"] = config.bokeh
    ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)
    perm = jax.random.permutation(jax.random.PRNGKey(0), npix)

    @jax.jit
    def sorted_rays(o, d):
        order, _ = sort_for_packets(o, d, ir["bvh"]["node_bmin"][0],
                                    ir["bvh"]["node_bmax"][0])
        return o[order], d[order]

    o_inc, d_inc = sorted_rays(ray_o[perm], ray_d[perm])
    return config, ir, (ray_o, ray_d), (o_inc, d_inc)


def bench(fn, label):
    i, t = fn()
    float(jnp.sum(t.ravel()[:8]))
    t0 = time.time()
    for _ in range(REPS):
        i, t = fn()
    float(jnp.sum(t.ravel()[:8]) + jnp.sum(i.ravel()[:8].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS
    log(f"  {label:42s} {dt*1e3:8.1f} ms  ({npix/dt/1e6:5.1f} Mrays/s)")
    return dt


# ---------------- stage 1: VMEM 66k, frontier ladder --------------------
GRID1 = int(os.environ.get("GRID1", "182"))
config, ir, coh, inc = make(GRID1)
bp = ir["bvh_packed"]
T = ir["tris"]["verts"].shape[0]
stream1 = T > 120_000
log(f"stage 1: {T} tris depth={config.bvh_depth} (stream={stream1})")


def trav(o, d, sub, K):
    return lambda: traverse_pallas(
        bp["nodes"], bp["leaf"], bp["tris9"], o, d,
        depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
        interpret=interp, stream=stream1, sub=sub, frontier=K)


deadline = time.time() + 20.0
while time.time() < deadline:  # burn through the tunnel transient
    f = trav(*coh, 32, 1)
    i, t = f()
    float(jnp.sum(t.ravel()[:8]))

KS = [int(k) for k in os.environ.get("KS", "1,2,4").split(",")]
SUBS = [int(s) for s in os.environ.get("SUBS", "32,8").split(",")]
for sub in SUBS:
    for K in KS:
        bench(trav(*coh, sub, K), f"coherent sub={sub} frontier={K}")
for sub in SUBS:
    for K in KS:
        bench(trav(*inc, sub, K), f"sorted-incoh sub={sub} frontier={K}")

# ---------------- stage 2: stream scale, wide fate ----------------------
STAGE2 = [int(g) for g in os.environ.get("STAGE2", "318,708").split(",")
          if g]
for grid in STAGE2:
    config, ir, coh, inc = make(grid)
    bp = ir["bvh_packed"]
    wb = {k: __import__("numpy").asarray(ir["bvh"][k]) for k in
          ("node_bmin", "node_bmax", "node_from", "node_to")}
    wb["depth"] = config.bvh_depth
    bw = dict(zip(("nodes", "leaf"), pack_bvh_wide(wb)))
    T = ir["tris"]["verts"].shape[0]
    log(f"stage 2: {T} tris depth={config.bvh_depth}")

    def stream_bin(o, d, K):
        return lambda: traverse_pallas(
            bp["nodes"], bp["leaf"], bp["tris9"], o, d,
            depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
            interpret=interp, stream=True, sub=config.pallas_sub,
            frontier=K)

    def stream_wide(o, d):
        return lambda: traverse_wide(
            bw["nodes"], bw["leaf"], bp["tris9"], o, d,
            depth=config.bvh_depth, max_leaf=config.bvh_max_leaf,
            interpret=interp, stream=True, sub=config.pallas_sub)

    bench(stream_bin(*coh, 1), f"{T//1000}k coherent stream binary")
    bench(stream_wide(*coh), f"{T//1000}k coherent stream 8-wide")
    bench(stream_bin(*coh, 4), f"{T//1000}k coherent stream frontier=4")
    bench(stream_bin(*inc, 1), f"{T//1000}k sorted-incoh stream binary")
    bench(stream_wide(*inc), f"{T//1000}k sorted-incoh stream 8-wide")
    bench(stream_bin(*inc, 4), f"{T//1000}k sorted-incoh stream frontier=4")
