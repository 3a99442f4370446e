"""Sweep BVH depth on the real chip: scalar node visits vs vector leaf scans."""
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

RES = int(os.environ.get("BENCH_RES", "1024"))
GRID = int(os.environ.get("BENCH_GRID", "182"))
REPS = int(os.environ.get("REPS", "3"))
DEPTHS = [int(d) for d in os.environ.get("DEPTHS", "10,11,12,13,15").split(",")]

mesh = heightfield_mesh(GRID)
tv = np.asarray(mesh.verts, np.float32)
T = tv.shape[0]
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
ray_o_inc, ray_d_inc = ray_o[perm], ray_d[perm]

ref_idx = None
for D in DEPTHS:
    bvh = build_bvh(tv, depth=D)
    nodes, leaf, tris9 = pack_bvh_for_pallas(bvh, tv[bvh["perm"]])
    ml = bvh["max_leaf"]

    def trav(o, d, nodes=nodes, leaf=leaf, tris9=tris9, D=D, ml=ml):
        return traverse_pallas(nodes, leaf, tris9, o, d, depth=D,
                               max_leaf=int(ml), interpret=interp)

    out = trav(ray_o, ray_d)
    ti = float(jnp.sum(out[1][jnp.isfinite(out[1])]))
    t0 = time.time()
    for _ in range(REPS):
        out = trav(ray_o, ray_d)
    float(jnp.sum(out[1][jnp.isfinite(out[1])]))
    dt_coh = (time.time() - t0) / REPS

    out2 = trav(ray_o_inc, ray_d_inc)
    float(jnp.sum(out2[1][jnp.isfinite(out2[1])]))
    t0 = time.time()
    for _ in range(REPS):
        out2 = trav(ray_o_inc, ray_d_inc)
    float(jnp.sum(out2[1][jnp.isfinite(out2[1])]))
    dt_inc = (time.time() - t0) / REPS

    # correctness: hit t must match across depths
    t_sorted = np.asarray(out[1])
    if ref_idx is None:
        ref_idx = t_sorted
        ok = True
    else:
        ok = np.allclose(np.where(np.isfinite(t_sorted), t_sorted, -1),
                         np.where(np.isfinite(ref_idx), ref_idx, -1),
                         atol=1e-3)
    print(f"depth={D:2d} max_leaf={ml:4d} coh={dt_coh*1e3:8.1f}ms "
          f"inc={dt_inc*1e3:8.1f}ms match={ok}", flush=True)
