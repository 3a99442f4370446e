"""Sweep the Pallas traversal tile width (sub*128 rays per packet).

A wider tile amortizes the scalar-driven BVH walk (one node visit per
tile) over more rays, but the tile descends into the UNION of its rays'
nodes, so incoherent tiles blow up.  Times coherent camera rays and
Morton-sorted shuffled rays per tile width on the real chip.
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

from scenes import heightfield_mesh
from elevenrender_tpu.ops.bvh import build_bvh
from elevenrender_tpu.ops.bvh_pallas import pack_bvh_for_pallas, traverse_pallas
from elevenrender_tpu.ops.camera import camera_ray
from elevenrender_tpu.ops.sort import sort_for_packets

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "3"))
SUBS = [int(s) for s in os.environ.get("SUBS", "4,8,16,32").split(",")]

mesh = heightfield_mesh(GRID)
tv = np.asarray(mesh.verts, np.float32)
npix = RES * RES
interp = jax.default_backend() == "cpu"

idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam = dict(position=jnp.asarray([0.0, 1.5, -4.0]),
           rotation=jnp.asarray([15.0, 0.0, 0.0]),
           focal_length=jnp.float32(0.035), sensor_width=jnp.float32(0.036),
           sensor_height=jnp.float32(0.024), aperture=jnp.float32(0.0),
           focus_distance=jnp.float32(1.0), bokeh=False)
ray_o, ray_d = camera_ray(cam, RES, RES, px, py, z, z, z, z, z)
perm = jax.random.permutation(jax.random.PRNGKey(0), npix)

bvh = build_bvh(tv)
nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, np.asarray(
    tv[np.asarray(bvh["perm"])]))
print(f"tris={tv.shape[0]} depth={bvh['depth']} max_leaf={bvh['max_leaf']}")


@jax.jit
def sorted_rays(o, d):
    order, _ = sort_for_packets(o, d, bvh["node_bmin"][0], bvh["node_bmax"][0])
    return o[order], d[order]


ray_o_inc, ray_d_inc = sorted_rays(ray_o[perm], ray_d[perm])
ref = None
for sub in SUBS:
    def trav(o, d, sub=sub):
        return traverse_pallas(nodes, leaf, tris9, o, d,
                               depth=bvh["depth"], max_leaf=bvh["max_leaf"],
                               interpret=interp, sub=sub)

    for name, o, d in (("coherent", ray_o, ray_d),
                       ("sorted-incoherent", ray_o_inc, ray_d_inc)):
        i, t = trav(o, d)
        i.block_until_ready()
        float(jnp.sum(t.ravel()[:8]))
        t0 = time.time()
        for _ in range(REPS):
            i, t = trav(o, d)
        float(jnp.sum(t.ravel()[:8]) + jnp.sum(i.ravel()[:8]))
        dt = (time.time() - t0) / REPS
        print(f"sub={sub:3d} tile={sub*128:5d} {name:18s} {dt*1e3:9.2f} ms "
              f"({npix/dt/1e6:.1f} Mrays/s)")
        if name == "coherent":
            if ref is None:
                ref = np.asarray(i)
            else:
                assert (np.asarray(i) == ref).all(), f"sub={sub} mismatch"
