"""Isolate why sweep_tile's coherent traversal is 3x profile_bench's:
cross rays x tables from the two scripts' construction paths."""
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

from scenes import heightfield_mesh, heightfield_scene
from elevenrender_tpu.ops.bvh import build_bvh
from elevenrender_tpu.ops.bvh_pallas import pack_bvh_for_pallas, traverse_pallas
from elevenrender_tpu.ops.camera import camera_ray

RES = 1024
GRID = 182
REPS = 3
npix = RES * RES

# --- profile_bench construction ---------------------------------------------
scene, config, ir = heightfield_scene(grid=GRID, res=RES, spp=64,
                                      compat=False)
idx = jnp.arange(npix, dtype=jnp.int32)
px, py = idx % RES, idx // RES
z = jnp.full((npix,), 0.5, jnp.float32)
cam_a = dict(ir["camera"])
cam_a["bokeh"] = config.bokeh
o_a, d_a = camera_ray(cam_a, RES, RES, px, py, z, z, z, z, z)
tab_a = (ir["bvh_packed"]["nodes"], ir["bvh_packed"]["leaf"],
         ir["bvh_packed"]["tris9"])

# --- sweep_tile construction -------------------------------------------------
mesh = heightfield_mesh(GRID)
tv = np.asarray(mesh.verts, np.float32)
cam_b = dict(position=jnp.asarray([0.0, 1.5, -4.0]),
             rotation=jnp.asarray([15.0, 0.0, 0.0]),
             focal_length=jnp.float32(0.035),
             sensor_width=jnp.float32(0.036),
             sensor_height=jnp.float32(0.024), aperture=jnp.float32(0.0),
             focus_distance=jnp.float32(1.0), bokeh=False)
o_b, d_b = camera_ray(cam_b, RES, RES, px, py, z, z, z, z, z)
bvh = build_bvh(tv)
tab_b = pack_bvh_for_pallas(bvh, np.asarray(tv[np.asarray(bvh["perm"])]))

print("ray diff:", float(jnp.abs(o_a - o_b).max()),
      float(jnp.abs(d_a - d_b).max()))
print("table diffs:", [float(jnp.abs(x - y).max())
                       for x, y in zip(tab_a, tab_b)])
print("table shapes:", [tuple(x.shape) for x in tab_a],
      [tuple(y.shape) for y in tab_b])


def timeit(name, tabs, o, d):
    i, t = traverse_pallas(*tabs, o, d, depth=config.bvh_depth,
                           max_leaf=config.bvh_max_leaf)
    float(jnp.sum(t.ravel()[:8]))
    t0 = time.time()
    for _ in range(REPS):
        i, t = traverse_pallas(*tabs, o, d, depth=config.bvh_depth,
                               max_leaf=config.bvh_max_leaf)
    float(jnp.sum(t.ravel()[:8]) + jnp.sum(i.ravel()[:8].astype(jnp.float32)))
    print(f"{name:34s} {(time.time()-t0)/REPS*1e3:9.2f} ms")


timeit("ir tables + ir rays", tab_a, o_a, d_a)
timeit("ir tables + sweep rays", tab_a, o_b, d_b)
timeit("sweep tables + ir rays", tab_b, o_a, d_a)
timeit("sweep tables + sweep rays", tab_b, o_b, d_b)
