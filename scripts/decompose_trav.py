"""Decompose traversal time into interior walk / leaf overhead / leaf
Möller-Trumbore work, on the real chip (r4, toward VERDICT ask #2).

The r3 roofline left a contradiction: sorted-incoherent at d11/sub=32
measures 84% of the leaf-dominated VPU floor (suggesting leaf MT work
bounds it), yet deeper trees (halved leaf work, doubled visits) measured
WORSE, implying ~2,100-2,600 cycles of serialized cost per visit
(suggesting the walk bounds it).  This script separates the terms with
the kernel's leaf_mode probe:

  full   = walk + leaf-parent overhead + MT row loops   (the real kernel)
  noscan = walk + leaf-parent overhead                  (DMA + fetch, no MT)
  skip   = walk only

Probe modes never tighten best_t (no hits), so they walk more nodes than
the real kernel; every row reports per-visit/per-leafparent NORMALIZED
costs via count_steps counters, which is what the optimization decision
needs.

Usage: BENCH_GRID=182 REPS=3 python scripts/decompose_trav.py
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
from elevenrender_tpu.ops.sort import sort_for_packets

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "3"))
CLOCK = 0.94e9

npix = RES * RES
interp = jax.default_backend() == "cpu"
scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=1,
                                      compat=False)
T = ir["tris"]["verts"].shape[0]
stream = T > 120_000
sub = config.pallas_sub
NT = -(-npix // (sub * 128))
print(f"tris={T} depth={config.bvh_depth} max_leaf={config.bvh_max_leaf} "
      f"sub={sub} stream={stream}", flush=True)

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


def trav(o, d, mode, count=False):
    return traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                           depth=config.bvh_depth,
                           max_leaf=config.bvh_max_leaf, interpret=interp,
                           stream=stream, sub=sub, count_steps=count,
                           leaf_mode=mode)


# Duration burn-in (the tunnel transient is time-based, docs/PERF.md).
# 60 s: the r4 run's first timed cell was still inflated after 20 s
# (467 ms vs the replicated 87 ms) — the transient outlasts 20 s.
_deadline = time.time() + 60.0
while time.time() < _deadline:
    out = trav(ray_o, ray_d, "full")
    float(jnp.sum(out[1].ravel()[:8]))

for name, o, d in (("coherent", ray_o, ray_d),
                   ("sorted-incoherent", ray_o_inc, ray_d_inc)):
    rows = {}
    for mode in ("full", "noscan", "skip"):
        i, t = trav(o, d, mode)
        float(jnp.sum(t.ravel()[:8]))
        t0 = time.time()
        for _ in range(REPS):
            i, t = trav(o, d, mode)
        float(jnp.sum(t.ravel()[:8])
              + jnp.sum(i.ravel()[:8].astype(jnp.float32)))
        dt = (time.time() - t0) / REPS
        _, _, c = trav(o, d, mode, count=True)
        c = np.asarray(c)
        V, L, B = int(c[:, 0].sum()), int(c[:, 1].sum()), int(c[:, 2].sum())
        rows[mode] = (dt, V, L, B)
        print(f"[{name}] {mode:7s} {dt*1e3:8.2f} ms   V/tile {V/NT:7.0f}  "
              f"L/tile {L/NT:7.0f}  B/tile {B/NT:6.0f}  "
              f"({dt/max(V,1)*CLOCK:6.0f} cyc/visit)", flush=True)

    # Normalized decomposition: cost per interior visit from 'skip',
    # leaf-parent overhead per visit from 'noscan'-'skip' (their V are
    # comparable — identical walks, neither tightens best_t), MT cost per
    # leaf row from 'full' after subtracting walk+overhead at full's
    # OWN counts.
    dt_f, V_f, L_f, B_f = rows["full"]
    dt_n, V_n, L_n, B_n = rows["noscan"]
    dt_s, V_s, L_s, B_s = rows["skip"]
    cyc_visit = dt_s / max(V_s, 1) * CLOCK
    cyc_leafparent = (dt_n - dt_s) / max(B_n, 1) * CLOCK
    walk_in_full = V_f * cyc_visit / CLOCK
    ovh_in_full = B_f * cyc_leafparent / CLOCK
    mt_in_full = dt_f - walk_in_full - ovh_in_full
    print(f"[{name}] DECOMP: walk {walk_in_full*1e3:7.2f} ms "
          f"({cyc_visit:.0f} cyc/visit) + leaf-ovh {ovh_in_full*1e3:7.2f} ms "
          f"({cyc_leafparent:.0f} cyc/leafparent) + MT {mt_in_full*1e3:7.2f} ms "
          f"({mt_in_full/max(L_f,1)*CLOCK:.0f} cyc/leafrow) "
          f"= {dt_f*1e3:.2f} ms", flush=True)
