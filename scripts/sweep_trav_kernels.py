"""A/B the BVH traversal kernels on the real chip, via the REAL render
construction path (build_ir; ADVICE r2: sweep_tile.py built its own
tables/rays and its conclusions disagreed with profile_bench's).

Times, per (kernel, sub) cell: coherent camera rays and Morton-sorted
shuffled rays, on the bench heightfield at BENCH_GRID (182 = 66k tris
VMEM-resident; 708 = 1M tris -> stream kernels).

Kernels: binary Pallas (ops/bvh_pallas.py, stream on/off per residency)
and 8-wide (experiments/bvh_wide.py, demoted r4).  Agreement with the binary walk is asserted
per cell (ties at equal t excluded — leaf visit order may differ).
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
from elevenrender_tpu.experiments.bvh_wide import (pack_bvh_wide,
                                                       traverse_wide)
from elevenrender_tpu.ops.camera import camera_ray
from elevenrender_tpu.ops.sort import sort_for_packets

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "3"))
SUBS = [int(s) for s in os.environ.get("SUBS", "8,16,32").split(",")]
npix = RES * RES
interp = jax.default_backend() == "cpu"

DEPTH = os.environ.get("DEPTH")
scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=64,
                                      compat=False,
                                      bvh_depth=int(DEPTH) if DEPTH else None)
T = ir["tris"]["verts"].shape[0]
stream = T > 120_000  # integrator._resolve_trace_mode VMEM limit
print(f"tris={T} depth={config.bvh_depth} max_leaf={config.bvh_max_leaf} "
      f"stream={stream}")

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


ray_o_inc, ray_d_inc = sorted_rays(ray_o[perm], ray_d[perm])

bp = ir["bvh_packed"]
wb = {k: np.asarray(ir["bvh"][k]) for k in
      ("node_bmin", "node_bmax", "node_from", "node_to")}
wb["depth"] = config.bvh_depth
bw = dict(zip(("nodes", "leaf"), pack_bvh_wide(wb)))


_burned_in = False


def bench(name, fn, o, d, ref_t=None):
    # The axon tunnel's first kernel executions run ~2.4x slow and the
    # transient is TIME-based (~tens of seconds after first device use),
    # not count-based — a fixed number of warmup calls does not outlast
    # it (docs/PERF.md "measurement notes").  Burn for a duration.
    global _burned_in
    deadline = time.time() + (20.0 if not _burned_in else 0.0)
    _burned_in = True
    while True:
        i, t = fn(o, d)
        float(jnp.sum(t.ravel()[:8]))
        if time.time() >= deadline:
            break
    i.block_until_ready()
    t0 = time.time()
    for _ in range(REPS):
        i, t = fn(o, d)
    float(jnp.sum(t.ravel()[:8]) + jnp.sum(i.ravel()[:8].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms ({npix/dt/1e6:6.1f} Mrays/s)")
    if ref_t is not None:
        tn = np.asarray(t)
        bad = ~np.isclose(tn, ref_t, rtol=1e-5, atol=1e-6) \
            & ~(np.isinf(tn) & np.isinf(ref_t))
        assert bad.sum() == 0, f"{name}: {bad.sum()} t mismatches"
    return np.asarray(t)


for label, o, d in (("coherent", ray_o, ray_d),
                    ("sorted-incoherent", ray_o_inc, ray_d_inc)):
    ref_t = None
    for sub in SUBS:
        def fw(o, d, sub=sub):
            return traverse_wide(bw["nodes"], bw["leaf"], bp["tris9"], o, d,
                                 depth=config.bvh_depth,
                                 max_leaf=config.bvh_max_leaf,
                                 interpret=interp, stream=stream, sub=sub)

        for ordr in os.environ.get("ORDERS", "near,sign").split(","):
            def fb(o, d, sub=sub, ordr=ordr):
                return traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"],
                                       o, d, depth=config.bvh_depth,
                                       max_leaf=config.bvh_max_leaf,
                                       interpret=interp, stream=stream,
                                       sub=sub, order=ordr)

            t = bench(f"binary/{ordr}{' stream' if stream else ''} "
                      f"sub={sub} {label}", fb, o, d, ref_t)
            if ref_t is None:
                ref_t = t
        if os.environ.get("WIDE", "1") != "0":
            bench(f"wide{' stream' if stream else ''}   sub={sub} {label}",
                  fw, o, d, ref_t)
