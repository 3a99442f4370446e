"""A/B the leaf-row AABB pre-test (traverse_pallas(leaf_aabb=0/1/2)) on
the real chip — VERDICT r4 ask #1's first lever: 84% of sorted-incoherent
traversal is leaf Möller-Trumbore work (docs/PERF.md decomposition), and
the row boxes ride in the tri rows' spare lanes, so each skip trades ~33
vector ops + a branch for ~528.

Transient-proof cell ordering (docs/PERF.md measurement notes): every
config runs ONCE sacrificially (compile + tunnel burn-in), then the timed
cells run back-to-back.  Also prints the in-kernel skip rate (counts row
3 = tri slots actually MT-tested vs 8x rows touched).

Env: BENCH_GRID=182 (66k, VMEM) / 708 (1M, stream), REPS, SUB.
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
SUB = int(os.environ.get("SUB", "32"))
npix = RES * RES
interp = jax.default_backend() == "cpu"

scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=64,
                                      compat=False)
T = ir["tris"]["verts"].shape[0]
stream = T > 120_000
print(f"tris={T} depth={config.bvh_depth} max_leaf={config.bvh_max_leaf} "
      f"stream={stream} sub={SUB}", flush=True)

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
                                ir["bvh"]["node_bmax"][0],
                                dir_major=config.sort_dir_major)
    return o[order], d[order]


ray_o_inc, ray_d_inc = sorted_rays(ray_o[perm], ray_d[perm])
bp = ir["bvh_packed"]

REGIMES = (("coherent", ray_o, ray_d),
           ("sorted-incoherent", ray_o_inc, ray_d_inc))
MODES = [int(m) for m in os.environ.get("MODES", "0,1,2").split(",")]


def trav(o, d, la, count=False):
    return traverse_pallas(bp["nodes"], bp["leaf"], bp["tris9"], o, d,
                           depth=config.bvh_depth,
                           max_leaf=config.bvh_max_leaf,
                           interpret=interp, stream=stream, sub=SUB,
                           leaf_aabb=la, count_steps=count)


# --- sacrificial pass: compile EVERY cell (incl. the count-mode
# variants — a fresh compile mid-process re-arms the tunnel transient,
# docs/PERF.md) + burn the transient for a duration, then time.
skip = {}
t_burn = time.time()
for la in MODES:
    for name, o, d in REGIMES:
        i, t = trav(o, d, la)
        float(jnp.sum(t.ravel()[:8]))
        _, _, c = trav(o, d, la, count=True)
        c = np.asarray(c)
        skip[(name, la)] = (int(c[:, 3].sum()), int(c[:, 1].sum()) * 8)
while time.time() - t_burn < 60.0:
    i, t = trav(ray_o, ray_d, MODES[0])
    float(jnp.sum(t.ravel()[:8]))
print(f"[burn] {time.time()-t_burn:.0f} s", flush=True)

# --- timed cells (everything warm; no compiles from here on) ------------
ref = {}
for name, o, d in REGIMES:
    for la in MODES:
        i, t = trav(o, d, la)
        float(jnp.sum(t.ravel()[:8]))
        t0 = time.time()
        for _ in range(REPS):
            i, t = trav(o, d, la)
        float(jnp.sum(t.ravel()[:8])
              + jnp.sum(i.ravel()[:8].astype(jnp.float32)))
        dt = (time.time() - t0) / REPS
        tn = np.asarray(t)
        if name in ref:
            bad = ~np.isclose(tn, ref[name], rtol=1e-5, atol=1e-6) \
                & ~(np.isinf(tn) & np.isinf(ref[name]))
            assert bad.sum() == 0, f"{name} la={la}: {bad.sum()} mismatches"
        else:
            ref[name] = tn
        slots, potential = skip[(name, la)]
        print(f"{name:18s} leaf_aabb={la}  {dt*1e3:8.2f} ms "
              f"({npix/dt/1e6:5.1f} Mrays/s)   MT slots {slots/1e6:7.1f}M "
              f"/ {potential/1e6:7.1f}M potential "
              f"({100*(1-slots/max(potential,1)):.0f}% skipped)", flush=True)
